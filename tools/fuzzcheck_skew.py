"""MONOKEY-WAREHOUSE differential — the maximal-skew tier.

Every foreign key and low-cardinality grouping key in the fact tables
is collapsed to ONE value (taken from the real data, so referential
integrity and types are preserved; primary keys untouched): one
nation holds every customer and supplier, one customer owns every
order, one part/supplier pair appears on every lineitem, one user
emits every event, one source produced every document, one label
covers every embedding.

At 100 TB this is the hot-key shape AQE's skew-join handling exists
for; differentially it isolates classes the uniform corpora cannot:

- single-group aggregates: every groupBy collapses to one group, so
  between-group terms vanish (n=1 group counts, zero between-group
  variance in ANOVA-like stats) and any n-1 / (k-1) denominator hits
  zero;
- giant single-partition windows: one user's session window spans the
  whole events table — per-user folds, debounces, and sessionizers
  run their longest possible chain;
- tie-density: grouping keys that used to disambiguate ORDER BY
  prefixes are now constant, so every position-sensitive query leans
  entirely on its unique-id tail (a missing total-order tail shows up
  HERE as a hash mismatch, not in production three rounds later);
- join fan-out: every equi-join on a collapsed key is all-rows ×
  all-rows within one key group — any candidate generator whose
  bound is "per-key group size" (LSH buckets, self-joins) gets its
  worst case.

Both-sides errors remain SKIPs (shared raise-on-empty contracts).

    python tools/fuzzcheck_skew.py [query ...]

Default sweeps every table-backed oracle.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_skew"
SRC = "/root/testdata/sf0.001"

# table -> columns collapsed to that column's own MIN value (so the
# constant is a real, referentially-valid key of the right type)
COLLAPSE = {
    "customer": ["c_nationkey", "c_mktsegment"],
    "supplier": ["s_nationkey"],
    "part": ["p_brand", "p_type"],
    "orders": ["o_custkey", "o_orderpriority"],
    "lineitem": ["l_partkey", "l_suppkey"],
    "events": ["user_id"],
    "documents": ["source"],
    "embeddings": ["label"],
}


def _collapse(tab: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        i = tab.schema.get_field_index(c)
        field = tab.schema.field(i)
        lo = pc.min(tab.column(c)).as_py()
        const = pa.array([lo] * len(tab), type=field.type)
        tab = tab.set_column(i, field, const)
    return tab


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        tab = _collapse(tab, COLLAPSE.get(t, []))
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
    spark = get_spark("fuzzskew")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
