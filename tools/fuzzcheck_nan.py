"""NaN-tier differential fuzz — SCOPED variant of the joins
micro-warehouse (r7 ADVICE: "add NaN values to a fuzz corpus").

float NaN is a PRESENT value that is not NULL: SQL aggregates skip
NULLs but propagate NaN, orderings place NaN after every number in
both engines, and the engine's pandas seams must not conflate the two
(the r8 fold fix replaced dropna() with engine-side NULL masks for
exactly this reason). This corpus is the joins warehouse with an
additional ~2% NaN tier on the double measures (l_quantity,
l_extendedprice, o_totalprice), run against the PYTHON-FOLD family +
moment aggregates — the queries whose engine paths cross the
pandas/Arrow seam where NULL and NaN can blur. Scoped on purpose: a
registry-wide NaN sweep would mostly exercise well-defined NaN
propagation, while this set is where a silent drop is possible.

    python tools/fuzzcheck_nan.py [query ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402

from tools import fuzzcheck_joins as J  # noqa: E402
from tools.fuzzcore import run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_nan"

# the pandas-seam + moment-aggregate families
SCOPE = {
    "fold_global", "fold_histogram_pandas_udaf", "fold_reduce_option",
    "fold_product_user_alg", "fold_minmax_struct_ordering",
    "agg_stats_moments",
}


def build_corpus(path: str = FUZZ_DIR, seed: int = 424_242):
    import random

    J.build_corpus(path, seed=seed)
    rng = random.Random(seed + 1)

    def inject(table: str, cols: list[str], p: float = 0.02):
        # ~1.5% NaN plus ~1.5% ±inf (rng < 1.5*p with p=0.02 over a
        # half-NaN specials list): Spark floor maps NaN→0 and
        # inf→±Long.MaxValue silently, so both tiers probe the same
        # silent-zero/garbage class in quantized arithmetic
        specials = [float("nan"), float("nan"), float("inf"), float("-inf")]
        t = pq.read_table(f"{path}/{table}.parquet")
        d = t.to_pydict()
        for c in cols:
            d[c] = [
                rng.choice(specials) if v is not None and rng.random() < 1.5 * p else v
                for v in d[c]
            ]
        import pyarrow as pa

        pq.write_table(
            pa.table({k: pa.array(v, t.schema.field(k).type) for k, v in d.items()}),
            f"{path}/{table}.parquet",
        )

    inject("lineitem", ["l_quantity", "l_extendedprice"])
    inject("orders", ["o_totalprice"])
    return path


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    spark = get_spark("fuzznan")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) if len(sys.argv) > 1 else SCOPE
    n_ok, n_skip, failures = run_fuzz(
        spark, J.connect(FUZZ_DIR), FUZZ_DIR, set(J.TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
