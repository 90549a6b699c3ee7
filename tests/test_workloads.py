"""Differential check of EVERY registered workload against its DuckDB
oracle — the same comparison the driver harness runs at sf0.01
(CORRECTNESS gate), run here at the test scale factor."""

from __future__ import annotations

import pytest

from emma_spark.workloads import load_all
from tests.conftest import SF_DIR, assert_bag_equal

REGISTRY = load_all()
ORACLE_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_CASES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_bag_equal(df, duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_query_runs(name, spark):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_bitmap_dau_equals_count_distinct(spark):
    """events_bitmap_dau's popcount-of-OR must equal the direct
    count(distinct user_id) per day — an independent in-engine
    cross-check of the bitmap encoding (the oracle only proves both
    engines agree on the SAME encoding)."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["events_bitmap_dau"].fn(spark, SF_DIR)
    e = eio.read_parquet(spark, f"{SF_DIR}/events.parquet").df
    direct = e.groupBy(
        F.expr("CAST(CAST(date_trunc('day', ts) AS LONG) div 86400 AS BIGINT)")
          .alias("day")
    ).agg(F.countDistinct("user_id").alias("dau"))
    got = {r["day"]: r["dau"] for r in df.collect()}
    want = {r["day"]: r["dau"] for r in direct.collect()}
    assert got == want


def test_ses_fold_matches_python_recursion(spark):
    """orders_ses_level_fold's array fold must equal the literal
    sequential recursion run in Python over the same monthly series."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["orders_ses_level_fold"].fn(spark, SF_DIR)
    got = {r["o_orderpriority"]: r["ses_level_c"] for r in df.collect()}
    o = eio.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
    m = (
        o.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("mo"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("bigint")).alias("rev_c"))
        .collect()
    )
    series: dict = {}
    for r in m:
        series.setdefault(r["o_orderpriority"], []).append((r["mo"], r["rev_c"]))
    for pri, xs in series.items():
        vals = [v for _, v in sorted(xs)]
        s = vals[0]
        for x in vals[1:]:
            s = (3 * x + 7 * s) // 10
        assert got[pri] == s, pri


def test_rolling_wau_bitmap_equals_direct_distinct(spark):
    """Trailing-7-day bitmap WAU must equal the direct (quadratic)
    per-day count(distinct) over the trailing window."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["events_rolling_wau_bitmap"].fn(spark, SF_DIR)
    got = {r["day"]: r["wau"] for r in df.collect()}
    e = eio.read_parquet(spark, f"{SF_DIR}/events.parquet").df.select(
        F.expr("CAST(CAST(date_trunc('day', ts) AS LONG) div 86400 AS BIGINT)")
          .alias("day"),
        "user_id",
    ).collect()
    by_day: dict = {}
    for r in e:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    lo, hi = min(by_day), max(by_day)
    for d in range(lo, hi + 1):
        users = set()
        for k in range(max(lo, d - 6), d + 1):
            users |= by_day.get(k, set())
        assert got[d] == len(users), d
