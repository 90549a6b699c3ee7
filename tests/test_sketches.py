"""Count-Min / Bloom sketch properties (llm/sketches.py): the
estimator-error guarantees, not just oracle equality — CMS never
undercounts, Bloom never false-negatives."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from emma_spark.llm import sketches as SK
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tokens_df(spark):
    from emma_spark.llm.text import tokens
    from emma_spark.sources import io

    docs = io.read_parquet(spark, f"{SF_DIR}/documents.parquet").df
    return docs.select(F.explode(tokens(F.col("text"))).alias("token"))


def test_countmin_never_undercounts(spark, tokens_df):
    cms = SK.countmin_build(tokens_df, "token", d=4, w=256)
    exact = tokens_df.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.countmin_estimate(cms, exact.select("token"), "token", d=4, w=256)
    j = est.join(exact, "token")
    under = j.filter(F.col("est") < F.col("exact")).count()
    assert under == 0
    # with d=4 rows most tokens see at least one collision-free row at
    # this vocab size — the estimate should be exact for a majority
    n_exact = j.filter(F.col("est") == F.col("exact")).count()
    assert n_exact > j.count() * 0.5


def test_countmin_sketch_is_bounded(spark, tokens_df):
    cms = SK.countmin_build(tokens_df, "token", d=4, w=256)
    assert cms.count() <= 4 * 256
    # every input occurrence lands in every row: row mass == token count
    total = tokens_df.count()
    rows = cms.groupBy("row").agg(F.sum("cnt").alias("mass")).collect()
    assert len(rows) == 4 and all(r["mass"] == total for r in rows)


def test_bloom_no_false_negatives(spark):
    from emma_spark.sources import io

    o = io.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
    bloom = SK.bloom_build(o.select("o_custkey"), "o_custkey", m=4096, k=3)
    members = o.select(F.col("o_custkey").alias("k")).distinct()
    got = SK.bloom_contains(bloom, members, "k", m=4096, k=3)
    assert got.filter(~F.col("maybe_present")).count() == 0


def test_bloom_false_positive_rate_sane(spark):
    from emma_spark.sources import io

    o = io.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
    bloom = SK.bloom_build(o.select("o_custkey"), "o_custkey", m=8192, k=3)
    # probe keys far outside the member key range
    absent = spark.range(100000, 101000).select(F.col("id").alias("k"))
    got = SK.bloom_contains(bloom, absent, "k", m=8192, k=3)
    fp = got.filter(F.col("maybe_present")).count()
    # n≈1500 members, m=8192, k=3 → theoretical fp ≈ (1-e^{-3n/m})^3 ≈ 8%;
    # allow generous slack — this guards against "everything hits"
    assert fp < 1000 * 0.25
