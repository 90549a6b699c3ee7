"""MATCHED-SPARSE differential — the degenerate-MATCHED-group tier.

The r9 judge found the corpus-shape hole between the existing tiers:
the sparse tier slices facts but keeps REAL foreign keys, so selective
joins go EMPTY and divide-by-a-moment defects hide behind zero rows
(`ml_grouped_ols_slopes` passed sparse while crashing one-sidedly on
a 3-row matched corpus); the monokey-skew tier collapses everything
into ONE giant group, which keeps variance. Neither can produce a
join that MATCHES into single-row / zero-variance groups — exactly
the shape that makes `n·sxx − sx²` (and every data-dependent moment
denominator) zero under ANSI Spark, which raises DIVIDE_BY_ZERO
where DuckDB returns NULL.

This tier closes the hole: every fact table is cut to a 3-row slice
of the real sf0.001 data AND its foreign keys are REWRITTEN onto the
keys the referenced slice actually kept, with a [k0, k0, k1] cycle:

  - joins SURVIVE (the lineitem×part join yields 3 rows, not 0);
  - the k1 groups are SINGLE-ROW (n = 1 → zero variance, the judge's
    repro shape for ml_grouped_ols_slopes);
  - row 1's measure columns are overwritten with row 0's values, so
    the k0 groups are MULTI-ROW but CONSTANT-MEASURE (n = 2, x all
    equal → still zero variance — the shape a single-row guard alone
    would miss).

dims (region, nation) stay whole, as in the sparse tier. Uniqueness
invariants the corpus promises are preserved: event_id / doc_id /
o_orderkey keep their original values; lineitem's (l_orderkey,
l_linenumber) pair is re-pinned to [1, 2, 1] so the two rows sharing
an order keep distinct linenumbers; embeddings.vec_id is rewritten
onto the three kept doc_ids (distinct, so still unique) so the
vec_id = doc_id bridge used by the similarity family matches.

One-sided statuses from tools.diffcheck.compare_one make every
Spark-only or DuckDB-only crash a differential FAIL; both-sides
raises stay SKIPs (corpus-shape, e.g. raise-on-empty fold contracts
firing identically).

    python tools/fuzzcheck_matched.py [query ...]

Default sweeps every table-backed oracle — this tier exists to be
run wide.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_matched"
SRC = "/root/testdata/sf0.001"

DIMS = {"region", "nation"}
N_FACT = 3

# fact → [(fk_column, referenced_table, referenced_key)]
FK_MAP = {
    "lineitem": [
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
        ("l_orderkey", "orders", "o_orderkey"),
    ],
    "orders": [("o_custkey", "customer", "c_custkey")],
    "events": [("user_id", "customer", "c_custkey")],
    # the similarity family bridges embeddings to documents via
    # `vec_id AS doc_id` — rewrite vec_id onto the kept doc_ids
    # (three distinct values, so vec_id stays unique)
    "embeddings": [("vec_id", "documents", "doc_id")],
}

# measure columns copied row0 → row1 to force constant-measure
# multi-row groups (keys / identifiers excluded)
MEASURES = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "events": ["value"],
}


def _set_column(tab: pa.Table, col: str, values) -> pa.Table:
    i = tab.schema.get_field_index(col)
    arr = pa.array(values, type=tab.schema.field(i).type)
    return tab.set_column(i, tab.schema.field(i), arr)


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    tabs = {}
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        if t not in DIMS:
            tab = tab.slice(0, N_FACT)
        tabs[t] = tab

    # rewrite FKs onto kept referenced keys: [k0, k0, k1]
    for fact, fks in FK_MAP.items():
        tab = tabs[fact]
        n = tab.num_rows
        for col, ref, refkey in fks:
            kept = tabs[ref].column(refkey).to_pylist()
            if fact == "embeddings":
                # unique bridge: one kept doc_id per row
                pattern = [kept[i % len(kept)] for i in range(n)]
            else:
                pattern = [kept[0], kept[0], kept[1]][:n]
            tab = _set_column(tab, col, pattern)
        tabs[fact] = tab

    # keep (l_orderkey, l_linenumber) unique under the [o0,o0,o1] cycle
    li = tabs["lineitem"]
    tabs["lineitem"] = _set_column(li, "l_linenumber",
                                   [1, 2, 1][: li.num_rows])

    # constant-measure multi-row groups: row1 measures := row0's
    for fact, cols in MEASURES.items():
        tab = tabs[fact]
        if tab.num_rows < 2:
            continue
        for col in cols:
            vals = tab.column(col).to_pylist()
            vals[1] = vals[0]
            tab = _set_column(tab, col, vals)
        tabs[fact] = tab

    for t, tab in tabs.items():
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
    spark = get_spark("fuzzmatched")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
