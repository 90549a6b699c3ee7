"""TIES differential — the full-cardinality CONSTANT-MEASURE tier.

The corpus-shape hole this closes (the gap method, continued): the
monokey-skew tier collapses KEYS but keeps measure variance, the
matched tier forces zero variance but on a 3-ROW corpus, and the
events const tier constifies only `value` while keeping distinct
timestamps. Nothing makes EVERY ranking, top-k, argmax/min_by,
first/last-by-time, dedup-keeper, or nearest-neighbor selection face
FULL tie ambiguity at full cardinality — the shape a 100 TB corpus
hits constantly (duplicate ingests share event times; list prices
quantize to identical values; near-dup docs tie on every score).

This tier keeps every table at full sf0.001 cardinality and REAL
keys/categories, but pins every measure, timestamp, document text,
and embedding vector to ONE constant:

  - lineitem: quantity/extendedprice/discount/tax const, shipdate
    const mid-1996 (date filters match everything, maximizing rows
    through ranked paths);
  - orders: totalprice const, orderdate const mid-1996;
  - events: value const, ts const (every event simultaneous — every
    per-user ordering, session gap, and recency pick is a total tie);
  - customer/supplier/part: acctbal / retailprice const;
  - documents: one identical text for all 500 docs (n_chars kept
    consistent) — exact-dup keeper choice, MinHash signatures, LSH
    buckets, and every quality/BM25 score tie across the corpus;
  - embeddings: one identical non-zero vector — every pairwise
    distance ties, so ANN top-k is pure tie-break.

A query diverges here iff some selection among tied rows is not
pinned to a deterministic total order on BOTH engines — i.e. its
result at scale is partition-layout-dependent. One-sided statuses
from tools.diffcheck.compare_one make any engine-only crash a FAIL;
both-sides raises stay SKIPs.

    python tools/fuzzcheck_ties.py [query ...]

Default sweeps every table-backed oracle — this tier exists to be
run wide. Fully deterministic — no rng; the degeneracy IS the point.
"""
import datetime
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_ties"
SRC = "/root/testdata/sf0.001"

MID_1996 = datetime.datetime(1996, 6, 15)
ONE_TS = datetime.datetime(2024, 3, 1, 12, 0, 0)
DOC_TEXT = (
    "The quick brown fox jumps over the lazy dog while the dog "
    "sleeps near the quiet river and the fox runs away fast."
)

# table -> {column: constant}; applied to every row
CONSTS = {
    "lineitem": {
        "l_quantity": 10.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.02,
        "l_shipdate": MID_1996,
    },
    "orders": {"o_totalprice": 1000.0, "o_orderdate": MID_1996},
    "events": {"value": 7.0, "ts": ONE_TS},
    "customer": {"c_acctbal": 100.0},
    "supplier": {"s_acctbal": 100.0},
    "part": {"p_retailprice": 500.0},
    "documents": {"text": DOC_TEXT, "n_chars": len(DOC_TEXT)},
}


def _set_const(tab: pa.Table, col: str, value) -> pa.Table:
    i = tab.schema.get_field_index(col)
    arr = pa.array([value] * tab.num_rows, type=tab.schema.field(i).type)
    return tab.set_column(i, tab.schema.field(i), arr)


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        for col, value in CONSTS.get(t, {}).items():
            tab = _set_const(tab, col, value)
        if t == "embeddings":
            # one identical non-zero vector for every row: every
            # pairwise cosine/L2 distance ties exactly
            dim = len(tab.column("embedding")[0].as_py())
            vec = [0.1 * ((i % 4) + 1) for i in range(dim)]
            tab = _set_const(tab, "embedding", vec)
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
    spark = get_spark("fuzzties")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
