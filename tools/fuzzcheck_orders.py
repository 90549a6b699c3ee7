"""Adversarial orders-table differential — fourth fuzz harness, for
the relational family (the registry's largest): NULLs in every
nullable column, rounding-edge prices, boundary dates, duplicate and
skewed keys, out-of-domain statuses — against every orders-only batch
query's oracle, through the SAME driver-faithful comparator as
tools/diffcheck.py.

The seam classes this corpus exists to trigger, which the real
testdata (no NULLs, uniform keys, clean domains) never can:

* NULL ordering: Spark ASC sorts NULLS FIRST, DuckDB NULLS LAST — any
  row_number/rank/LIMIT over a nullable expression diverges silently.
* NULL propagation through quantization chains (floor(NULL*100+0.5)),
  conditional aggregates (count(col) vs count(*)), and coalesce seams.
* Half-cent prices (x.xx5 — floor(p*100+0.5) rounding edges where the
  double representation sits just below/above the boundary).
* Duplicate order keys and heavy-skew customers (argmax slot ties,
  window frames with peer rows).
* Out-of-domain status/priority strings (CASE/IN fall-through arms).

Run after touching any orders/relational contract:

    python tools/fuzzcheck_orders.py [query ...]

A fixed-seed subset also runs in the pytest suite
(tests/test_fuzz_differential.py).
"""
import datetime
import os
import random
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_ord"

STATUSES = ["O", "F", "P", "X", "", None]          # X/''/NULL out-of-domain
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NOT SPECIFIED",
    "9-BOGUS", None,
]
# prices hitting the floor(p*100 + 0.5) edge from both sides, plus
# domain extremes; dates stay in the TPC-H-ish window (pre-1970 is an
# input-domain exclusion — div-vs-// truncation diverges there by
# documented contract) and prices stay >= 0 (the TPC-H o_totalprice
# domain; packed-slot folds contract on non-negative cents)
EDGE_PRICES = [0.005, 0.015, 0.025, 2.675, 0.0,
               499999.995, 123456.785, 1e-9, None]
EDGE_DATES = [
    datetime.datetime(1995, 1, 1),
    datetime.datetime(1997, 12, 31, 23, 59, 59),
    datetime.datetime(1998, 1, 1),                 # the drift split point
    datetime.datetime(2001, 8, 1),
]


def build_corpus(path: str = FUZZ_DIR, n_rows: int = 4000, seed: int = 2024):
    rng = random.Random(seed)
    base = datetime.datetime(1995, 1, 1)
    rows = []
    for i in range(n_rows):
        # duplicate keys ~5%; heavy-skew customer 0 gets 30% of orders
        okey = rows[rng.randrange(len(rows))][0] if (rows and rng.random() < 0.05) else i
        ckey = 0 if rng.random() < 0.3 else rng.randint(0, 199)
        status = rng.choice(STATUSES) if rng.random() < 0.2 else rng.choice(["O", "F", "P"])
        if rng.random() < 0.25:
            price = rng.choice(EDGE_PRICES)
        else:
            price = round(rng.uniform(900.0, 500000.0), 2)
        if rng.random() < 0.1:
            date = rng.choice(EDGE_DATES)
        elif rng.random() < 0.03:
            date = None
        else:
            date = base + datetime.timedelta(
                days=rng.randint(0, 2400), seconds=rng.randint(0, 86399)
            )
        prio = rng.choice(PRIORITIES) if rng.random() < 0.15 else rng.choice(PRIORITIES[:5])
        rows.append((okey, ckey, status, price, date, prio))
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        f"{path}/orders.parquet",
    )
    return path


FUZZ_DIR_CONST = "/tmp/emma_fuzz_ord_const"


def build_corpus_constant(path: str = FUZZ_DIR_CONST):
    """CONSTANT-SERIES tier (r9, the events-tier sibling): one price,
    one weekday rhythm, one status/priority per slot position — zero
    variance in every price/weekday/group series, driving the
    moment-statistic denominators (ANOVA F within-variance,
    Jarque-Bera m2, drift chi2, z-bands) to exactly 0 on orders-family
    oracles. Deterministic — the degeneracy is the point."""
    base = datetime.datetime(1995, 1, 6)
    rows = []
    i = 0
    for week in range(8):
        for slot in range(40):
            date = base + datetime.timedelta(
                days=7 * week + slot % 5, seconds=3600 * (slot % 7))
            rows.append((
                i, slot % 10, ["O", "F", "P"][slot % 3], 1000.0, date,
                PRIORITIES[slot % 5],
            ))
            i += 1
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        f"{path}/orders.parquet",
    )
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{path}/orders.parquet')"
    )
    return con


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    build_corpus_constant()
    spark = get_spark("fuzzord")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, {"orders"}, only=only
    )
    print(f"\n[random] {n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    n_ok2, n_skip2, failures2 = run_fuzz(
        spark, connect(FUZZ_DIR_CONST), FUZZ_DIR_CONST, {"orders"}, only=only
    )
    print(f"[const]  {n_ok2} ok, {n_skip2} skipped, {len(failures2)} FAIL")
    spark.stop()
    return 1 if failures or failures2 else 0


if __name__ == "__main__":
    raise SystemExit(main())
