"""EMPTY-FACT-TABLES differential — the zero-row tier.

The sparse tier (3-row facts) makes most selective filters match
nothing; this tier removes the last escape hatch by making every fact
table LITERALLY empty (schema preserved, dims whole). At 100 TB this
is the "new date partition before the first ingest lands" shape: every
global aggregate sees zero rows, every join side is empty, every
window has no frames, every collected array is []. Divergence classes
it isolates that 3 rows cannot:

- global-aggregate seams: Spark `sum()` over zero rows is NULL but a
  0-seeded `aggregate()` fold is 0; DuckDB `list_sum([])` is NULL —
  any query whose oracle materializes a scalar row from an aggregate
  CTE while Spark's plan emits zero rows (or vice versa) diverges on
  ROW COUNT here, invisibly at 3 rows.
- driver-side `.collect()` seeds: k-row inits (kmeans centroids,
  IVF codebooks, grid candidates) collected from an empty table.
- empty-DataFrame writes and re-reads (io_* roundtrips).

Both-sides errors remain SKIPs (raise-on-empty fold contracts match
the reference's bag semantics on both engines by design).

    python tools/fuzzcheck_empty.py [query ...]

Default sweeps every table-backed oracle.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_empty"
SRC = "/root/testdata/sf0.001"

# dims stay whole (an empty dimension is ingest breakage, not a
# query-semantics shape); every fact table is cut to ZERO rows
DIMS = {"region", "nation"}


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        if t not in DIMS:
            tab = tab.slice(0, 0)
        pq.write_table(tab, f"{path}/{t}.parquet")
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{path}/{t}.parquet')"
        )
    return con


def main(argv) -> int:
    from emma_spark.session import get_spark

    only = set(a for a in argv if not a.startswith("--")) or None
    build_corpus()
    spark = get_spark("fuzzempty")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
