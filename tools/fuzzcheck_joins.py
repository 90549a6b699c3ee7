"""Adversarial multi-table (join-family) differential — fifth fuzz
harness: a full TPC-H-ish micro-warehouse (region nation customer
supplier part orders lineitem) with NULL FOREIGN KEYS, orphaned FKs,
NULL measures/attributes, duplicate keys and heavy skew — against
every query whose oracle touches only these tables, through the same
driver-faithful comparator as tools/diffcheck.py.

The class this corpus exists to decide: ``DataBag.equi_join`` joins
with ``eqNullSafe`` (reference parity — Scala key-extractor equality,
where null == null) while SQL ``=`` never matches NULL; any oracle
that writes ``a.k = b.k`` for a query routed through equi_join
diverges the moment an FK is NULL. Plus the classes the single-table
corpora proved out: NULL ordering, count(*) vs count(col), NULL
propagation through quantization chains, and aggregate NULL-skipping
asymmetries.

Primary keys stay NON-NULL (a PK is the table's primary dimension —
the ingest-reject rule); FKs go NULL at ~3% and orphaned at ~2%,
measures/attributes NULL at ~4%.

    python tools/fuzzcheck_joins.py [query ...]
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

FUZZ_DIR = "/tmp/emma_fuzz_join"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
)


def build_corpus(path: str = FUZZ_DIR, seed: int = 777_001):
    rng = random.Random(seed)
    os.makedirs(path, exist_ok=True)

    def write(name, cols):
        pq.write_table(pa.table(cols), f"{path}/{name}.parquet")

    n_reg, n_nat, n_cust, n_supp, n_part = 5, 25, 150, 20, 40
    n_ord, n_li = 1500, 4000

    write("region", {
        "r_regionkey": pa.array(range(n_reg), pa.int32()),
        "r_name": pa.array([f"R{i}" for i in range(n_reg)], pa.string()),
    })
    write("nation", {
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"N{i}" for i in range(n_nat)], pa.string()),
        # one NULL region FK + one orphan
        "n_regionkey": pa.array(
            [None if i == 7 else (99 if i == 13 else i % n_reg)
             for i in range(n_nat)], pa.int32()),
    })

    def fk(domain, null_p=0.03, orphan_p=0.02, orphan=10**6):
        r = rng.random()
        if r < null_p:
            return None
        if r < null_p + orphan_p:
            return orphan
        return rng.randrange(domain)

    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE", None]
    write("customer", {
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"C{i}" for i in range(n_cust)], pa.string()),
        "c_nationkey": pa.array([fk(n_nat) for _ in range(n_cust)], pa.int32()),
        "c_acctbal": pa.array(
            [None if rng.random() < 0.04
             else round(rng.uniform(-999.99, 9999.99), 2)
             for _ in range(n_cust)], pa.float64()),
        "c_mktsegment": pa.array(
            [segs[0] if rng.random() < 0.5 else rng.choice(segs)
             for _ in range(n_cust)], pa.string()),
    })
    write("supplier", {
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(n_supp)], pa.string()),
        "s_nationkey": pa.array([fk(n_nat) for _ in range(n_supp)], pa.int32()),
        "s_acctbal": pa.array(
            [None if rng.random() < 0.04
             else round(rng.uniform(-999.99, 9999.99), 2)
             for _ in range(n_supp)], pa.float64()),
    })
    brands = [f"Brand#{i}" for i in range(1, 6)] + [None]
    types = ["STANDARD BRASS", "SMALL PLATED", "ECONOMY TIN", None]
    write("part", {
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"P{i}" for i in range(n_part)], pa.string()),
        "p_brand": pa.array([rng.choice(brands) for _ in range(n_part)], pa.string()),
        "p_type": pa.array([rng.choice(types) for _ in range(n_part)], pa.string()),
        "p_size": pa.array(
            [None if rng.random() < 0.04 else rng.randint(1, 50)
             for _ in range(n_part)], pa.int32()),
        "p_retailprice": pa.array(
            [None if rng.random() < 0.04 else round(rng.uniform(900, 2000), 2)
             for _ in range(n_part)], pa.float64()),
    })

    base = datetime.datetime(1995, 1, 1)
    statuses = ["O", "F", "P", None]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NOT SPECIFIED", None]
    o_rows = []
    for i in range(n_ord):
        # heavy skew: customer 0 owns 20% of orders
        ck = 0 if rng.random() < 0.2 else fk(n_cust)
        date = (None if rng.random() < 0.02
                else base + datetime.timedelta(days=rng.randint(0, 2000),
                                               seconds=rng.randint(0, 86399)))
        price = (None if rng.random() < 0.04
                 else round(rng.uniform(900.0, 500000.0), 2))
        o_rows.append((i, ck, rng.choice(statuses) if rng.random() < 0.2
                       else rng.choice(statuses[:3]), price, date,
                       rng.choice(prios) if rng.random() < 0.15
                       else rng.choice(prios[:5])))
    write("orders", {
        "o_orderkey": pa.array([r[0] for r in o_rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in o_rows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in o_rows], pa.string()),
        "o_totalprice": pa.array([r[3] for r in o_rows], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in o_rows], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in o_rows], pa.string()),
    })

    flags = ["R", "A", "N", None]
    l_rows = []
    for i in range(n_li):
        l_rows.append((
            rng.randrange(n_ord),                      # l_orderkey (FK, non-null here: PK part)
            fk(n_part),                                # l_partkey
            fk(n_supp),                                # l_suppkey
            rng.randint(1, 7),                         # l_linenumber
            None if rng.random() < 0.04 else float(rng.randint(1, 50)),
            None if rng.random() < 0.04 else round(rng.uniform(900, 100000), 2),
            None if rng.random() < 0.04 else round(rng.uniform(0, 0.1), 2),
            round(rng.uniform(0, 0.08), 2),
            rng.choice(flags) if rng.random() < 0.15 else rng.choice(flags[:3]),
            rng.choice(["O", "F"]),
            None if rng.random() < 0.02
            else base + datetime.timedelta(days=rng.randint(0, 2000)),
        ))
    # degenerate-group tier (r8): a ZERO-VARIANCE group 'Z' (constant
    # quantity AND price) and a SINGLE-ROW group 'Y'. Under ANSI Spark
    # corr/regr_slope on such groups is a job-killing DIVIDE_BY_ZERO
    # while DuckDB returns NULL — the qcorr/qregr guards exist for
    # exactly this corpus shape.
    for _ in range(30):
        l_rows.append((rng.randrange(n_ord), fk(n_part), fk(n_supp),
                       1, 5.0, 1000.0, 0.02, 0.01, "Z", "O",
                       base + datetime.timedelta(days=100)))
    l_rows.append((rng.randrange(n_ord), fk(n_part), fk(n_supp),
                   1, 7.0, 1234.56, 0.03, 0.0, "Y", "F",
                   base + datetime.timedelta(days=200)))

    write("lineitem", {
        "l_orderkey": pa.array([r[0] for r in l_rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in l_rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in l_rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in l_rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in l_rows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in l_rows], pa.float64()),
        "l_discount": pa.array([r[6] for r in l_rows], pa.float64()),
        "l_tax": pa.array([r[7] for r in l_rows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in l_rows], pa.string()),
        "l_linestatus": pa.array([r[9] for r in l_rows], pa.string()),
        "l_shipdate": pa.array([r[10] for r in l_rows], pa.timestamp("us")),
    })
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{path}/{t}.parquet')"
        )
    return con


def main() -> int:
    from emma_spark.session import get_spark

    build_corpus()
    spark = get_spark("fuzzjoin")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
