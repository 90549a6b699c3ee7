"""Bucketed co-located joins: same keys + same bucket count on both
sides must join with NO exchange (the write-once-shuffle-never path
for recurring fact-fact joins at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emma_spark.sources import io
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    li = io.read_parquet(spark, f"{SF_DIR}/lineitem.parquet").df
    o = io.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
    io.write_bucketed(li.select("l_orderkey", "l_quantity"), "li_b", 8, "l_orderkey")
    io.write_bucketed(o.select("o_orderkey", "o_totalprice"), "o_b", 8, "o_orderkey")
    yield spark.table("li_b"), spark.table("o_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_b, o_b = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(o_b, li_b["l_orderkey"] == o_b["o_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # and it still computes the right thing
        n = j.count()
        li = io.read_parquet(spark, f"{SF_DIR}/lineitem.parquet").df
        o = io.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
        assert n == li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    li_b, _ = bucketed
    agg = li_b.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # grouping key == bucket key
