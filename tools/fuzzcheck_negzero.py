"""NEGATIVE-ZERO tier — the one IEEE float shape no other corpus
carries. -0.0 is numerically equal to 0.0 but prints differently
("-0.0" vs "0.0"), so the full-precision repr comparator sees any
place the engines disagree about the SIGN of a zero:

* grouping keys: Spark normalizes -0.0 to +0.0 in grouping/join keys
  (SPARK-32110); DuckDB groups them together by equality but may
  surface the first-seen representative — a double expression used as
  an output group key can print "-0.0" on one engine only.
* arithmetic: sum([-0.0, -0.0]) is -0.0 while sum([-0.0, 0.0]) is
  +0.0; x + (-x) is +0.0; floor(-0.0) keeps the sign in some engines
  and drops it in others. Quantized (floor(x*100+0.5) -> BIGINT)
  paths are immune — this tier certifies the repo's quantization
  discipline catches every output, not most of them.

Corpus: the joins micro-warehouse with ~3% of each double measure
replaced by -0.0 (in-domain everywhere: zero is a legal quantity,
price, or discount), swept registry-WIDE over every query whose
oracle touches only these tables — cheap, because -0.0 never raises;
the only possible signal is a silent repr/value divergence.

    python tools/fuzzcheck_negzero.py [query ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402

from tools import fuzzcheck_joins as J  # noqa: E402
from tools.fuzzcore import run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_negzero"


def build_corpus(path: str = FUZZ_DIR, seed: int = 909_090):
    import random

    J.build_corpus(path, seed=seed)
    rng = random.Random(seed + 1)

    def inject(table: str, cols: list[str], p: float = 0.03):
        t = pq.read_table(f"{path}/{table}.parquet")
        d = t.to_pydict()
        for c in cols:
            d[c] = [
                -0.0 if v is not None and rng.random() < p else v
                for v in d[c]
            ]
        import pyarrow as pa

        pq.write_table(
            pa.table({k: pa.array(v, t.schema.field(k).type) for k, v in d.items()}),
            f"{path}/{table}.parquet",
        )

    inject("lineitem", ["l_quantity", "l_extendedprice", "l_discount"])
    inject("orders", ["o_totalprice"])

    # events variant in the same dir: the value column is the
    # registry's most aggregated raw double
    from tools import fuzzcheck_events as E

    E.build_corpus(path)
    inject("events", ["value"])

    # embeddings variant: -0.0 sprinkled into vector ELEMENTS (dot
    # products, norms, centroid sums all flow through them), plus the
    # all-negative-zero vector — a zero-norm vector whose every
    # component prints with a sign
    from tools import fuzzcheck_embeddings as EM

    EM.build_corpus(path)
    t = pq.read_table(f"{path}/embeddings.parquet")
    d = t.to_pydict()
    for row in range(len(d["embedding"])):
        if rng.random() < 0.10 and d["embedding"][row] is not None:
            d["embedding"][row] = [
                -0.0 if rng.random() < 0.05 else x
                for x in d["embedding"][row]
            ]
    if d["embedding"]:
        d["embedding"][0] = [-0.0] * len(d["embedding"][0])
    import pyarrow as pa

    pq.write_table(
        pa.table({k: pa.array(v, t.schema.field(k).type) for k, v in d.items()}),
        f"{path}/embeddings.parquet",
    )
    return path


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    spark = get_spark("fuzznegzero")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) or None
    con = J.connect(FUZZ_DIR)
    for extra in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {extra} AS SELECT * FROM "
            f"read_parquet('{FUZZ_DIR}/{extra}.parquet')"
        )
    n_ok, n_skip, failures = run_fuzz(
        spark, con, FUZZ_DIR, set(J.TABLES) | {"events", "embeddings"},
        only=only,
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
