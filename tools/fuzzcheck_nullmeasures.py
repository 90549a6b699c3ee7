"""ALL-NULL-MEASURE differential — the "rows exist, values don't" tier.

The corpus-shape hole this closes: the joins micro-warehouse NULLs
measures at ~4% (every aggregate still sees plenty of non-null
input), and the empty tier removes the ROWS entirely (aggregates
produce no group rows at all). Neither produces the third regime a
100 TB ingest hits whenever a measure field lands before its
backfill: groups EXIST at full cardinality but every aggregate over
the measure is NULL (sum/avg/stddev/corr → NULL, count(col) → 0
while count(*) is large). That regime exercises a different seam set
than either neighbor:

  - rankings ORDER BY a now-NULL aggregate — engine-DEFAULT NULL
    placement differs (Spark ASC=NULLS FIRST / DESC=NULLS LAST;
    DuckDB defaults NULLS LAST both ways), so any unpinned ORDER BY
    over a nullable aggregate diverges;
  - arg_max/min_by/max_by over an all-NULL ordering column;
  - guards keyed on count(*) instead of count(measure);
  - COALESCE(sum, 0) vs bare sum asymmetries between a query and its
    oracle;
  - NULL propagation through quantize→reconstruct chains that were
    only ever fed at-most-4%-NULL input.

Tables stay at full sf0.001 cardinality with REAL keys, categories,
and timestamps; ONLY the numeric measure/attribute columns the
corpus contract allows to be NULL go all-NULL (PKs, FKs, timestamps
and documents.text are ingest-reject non-null by contract —
tools/fuzzcheck.py:75, fuzzcheck_joins.py:17 — and embeddings'
vector/label carry the similarity family's non-null contract).

    python tools/fuzzcheck_nullmeasures.py [query ...]

Default sweeps every table-backed oracle. Fully deterministic — no
rng; the degeneracy IS the point.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_nullm"
SRC = "/root/testdata/sf0.001"

# table -> columns set entirely NULL (nullable-by-contract measures)
NULL_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "events": ["value"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "documents": ["n_chars"],
}


def _null_column(tab: pa.Table, col: str) -> pa.Table:
    i = tab.schema.get_field_index(col)
    arr = pa.array([None] * tab.num_rows, type=tab.schema.field(i).type)
    return tab.set_column(i, tab.schema.field(i), arr)


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        for col in NULL_COLS.get(t, ()):
            tab = _null_column(tab, col)
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
    spark = get_spark("fuzznullm")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
