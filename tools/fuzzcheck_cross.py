"""Adversarial CROSS-FAMILY differential — sixth fuzz harness: the
union of the four table-family corpora (joins micro-warehouse +
unicode documents + edge-time events + degenerate embeddings) written
into ONE directory, so the queries whose oracles span families —
fact-to-dimension enrichment (customer x events), SCD2 point-in-time
lookup (orders x events), hybrid lexical+vector retrieval
(documents x embeddings), and the multi-table dataset fingerprint —
run against adversarial inputs for EVERY table they touch at once.

These five queries are exactly the registry's fuzz-coverage gap: each
single-family harness skips them (its oracle references a table
outside that harness's corpus), so until now their only adversarial
exposure was whichever side a single-family corpus covered. The key
domains line up by construction: events.user_id [0,25) is a subset of
c_custkey/o_custkey [0,150), and doc_id = vec_id = range(500).

By default runs ONLY the cross-family queries (the single-family ones
already run against these same generators in their own harnesses);
``--all`` sweeps every table-backed oracle over the unified corpus.

    python tools/fuzzcheck_cross.py [--all] [query ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from tools import (  # noqa: E402
    fuzzcheck,
    fuzzcheck_embeddings,
    fuzzcheck_events,
    fuzzcheck_joins,
)
from tools.fuzzcore import ALL_TABLES, run_fuzz, table_refs  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_all"

TABLES = tuple(ALL_TABLES)

# the coverage gap this harness exists to close: oracles spanning
# more than one single-family corpus
CROSS_QUERIES = {
    "pipeline_dataset_fingerprint",
    "scd2_point_in_time_lookup",
    "udf_cogroup_reconcile",
    "search_hybrid_rrf",
    "stream_static_enrich",
}


def build_corpus(path: str = FUZZ_DIR):
    """One directory holding every family's adversarial tables. Each
    generator is the single-family harness's own (same seeds), so a
    cross failure here reproduces under that family's corpus docs."""
    fuzzcheck_joins.build_corpus(path)  # 7 TPC-H tables, NULL/orphan FKs
    fuzzcheck.build_corpus(path)  # unicode/NULL documents
    fuzzcheck_events.build_corpus(path)  # edge-time/NULL events
    fuzzcheck_embeddings.build_corpus(path)  # degenerate embeddings
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{path}/{t}.parquet')"
        )
    return con


def main(argv):
    run_all = "--all" in argv
    names = [a for a in argv if not a.startswith("--")]
    from emma_spark.session import get_spark

    path = build_corpus()
    con = connect(path)
    spark = get_spark("fuzz-cross")
    spark.sparkContext.setLogLevel("ERROR")

    if names:
        only = set(names)
    elif run_all:
        only = None
    else:
        only = CROSS_QUERIES
    n_ok, n_skip, failures = run_fuzz(
        spark, con, path, set(TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
