"""DOMAIN-MAXIMUM differential — overflow discipline AT the bound.

Every numeric measure is scaled to the TOP of its documented input
domain (docs/SCALE.md "Input-domain contracts"): events.value to
±1e6 (the variance-family-safe bound), embedding components ×60
(≈ ±30), prices/balances ×~2-100 into the high 1e5-1e6 range — all
INSIDE the documented domains, so every green query is contractually
obliged to stay exact. What this isolates: any product/sum that
should have been lifted to DECIMAL(38,0)/HUGEINT but silently rides
LONG (Spark wraps or ANSI-raises while DuckDB's HUGEINT keeps going —
a one-sided FAIL), and any floor()-quantization whose double input
saturates. At 100 TB the sums are this large on REAL data; the r6/r7
overflow rules (cast DECIMAL before products, inside sums) are
re-proven at their working limit instead of at cozy mid-range values.

Distributions keep their shape (a pure per-value scale, no
re-ordering), so selective filters still select and groups still
group; only magnitudes change.

    python tools/fuzzcheck_domainmax.py [query ...]

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

FUZZ_DIR = "/tmp/emma_fuzz_domainmax"
SRC = "/root/testdata/sf0.001"

# column -> multiplicative scale, chosen to land near the documented
# domain ceiling (value ±1e6; |embedding| <= 30; prices/balances high
# 1e5-1e6 cents-exact)
SCALES = {
    ("events", "value"): 3000.0,        # 327 max  -> ~9.8e5
    ("orders", "o_totalprice"): 2.0,    # 5e5 max  -> ~1e6
    ("lineitem", "l_extendedprice"): 9.0,   # 1e5 -> ~9.4e5
    ("customer", "c_acctbal"): 100.0,   # ±1e4 -> ±1e6
    ("supplier", "s_acctbal"): 100.0,
    ("part", "p_retailprice"): 1000.0,  # 920 -> 9.2e5
}
_EMB_SCALE = 60.0  # ±0.49 -> ±29.4, under the |x| <= 30 bound


def _scale_cents(tab: pa.Table, col: str, k: float) -> pa.Table:
    """Scale, then re-quantize to exact cents: the corpus contract is
    cent-valued doubles (floor(v*100+0.5) is exact), and a raw scale
    would leave sub-cent noise that both engines would floor
    differently at the 0.5 boundary."""
    i = tab.schema.get_field_index(col)
    field = tab.schema.field(i)
    cents = pc.round(pc.multiply(tab.column(col).cast(pa.float64()),
                                 pa.scalar(100.0 * k)))
    v = pc.divide(cents, pa.scalar(100.0))
    return tab.set_column(i, field, v.cast(field.type))


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        for (tt, col), k in SCALES.items():
            if tt == t:
                tab = _scale_cents(tab, col, k)
        if t == "embeddings":
            i = tab.schema.get_field_index("embedding")
            field = tab.schema.field(i)
            col = tab.column("embedding").combine_chunks()
            scaled = pc.list_value_length(col)  # placeholder; rebuilt below
            flat = pc.multiply(col.flatten(), pa.scalar(_EMB_SCALE))
            arrs = []
            for chunk in (col.chunks if hasattr(col, "chunks") else [col]):
                f = pc.multiply(chunk.values.cast(pa.float64()),
                                pa.scalar(_EMB_SCALE))
                arrs.append(pa.ListArray.from_arrays(
                    chunk.offsets, f.cast(chunk.values.type)))
            tab = tab.set_column(i, field, pa.chunked_array(arrs))
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
    spark = get_spark("fuzzdomainmax")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
