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


# ---------------------------------------------------------------- text ops
def test_repetition_metrics_extremes(spark):
    import pyspark.sql.functions as F
    from emma_spark.llm.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),   # one gram repeated
            (2, "all tokens here are fully unique"),
            (3, "x"),                                # single token: no grams
            (4, ""),                                 # empty
        ],
        "id int, text string",
    )
    m = repetition_metrics(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            m["distinct_token_ratio"].alias("dr"),
            m["dup_2gram_share"].alias("dup"),
        ).collect()
    }
    assert rows[1]["dup"] > 0.7 and rows[1]["dr"] < 0.2
    assert rows[2]["dup"] == 0.0 and rows[2]["dr"] == 1.0
    assert rows[3]["dup"] == 0.0
    assert rows[4]["dup"] == 0.0


def test_pack_sequences_invariants(spark):
    import pyspark.sql.functions as F
    from emma_spark.llm.text import pack_sequences

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 300 + 1).alias("n_tokens")
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", ctx=512).collect()
    rows = sorted(packed, key=lambda r: r["doc_id"])
    # offsets are the exclusive prefix sum in doc_id order
    acc = 0
    for r in rows:
        assert r["pack_offset"] == acc
        assert r["pack_id"] == acc // 512
        acc += r["n_tokens"]
    # every pack id in a contiguous range
    pids = sorted({r["pack_id"] for r in rows})
    assert pids == list(range(pids[-1] + 1))


def test_pack_sequences_null_token_count_raises(spark):
    """A NULL token count must fail loudly (it would silently poison
    the cumulative offsets), executor-side via raise_error."""
    import pytest
    import pyspark.sql.functions as F
    from emma_spark.llm.text import pack_sequences

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") != 3, F.col("id") + 1).alias("n_tokens"),
    )
    with pytest.raises(Exception, match="pack_sequences: NULL"):
        pack_sequences(df, "doc_id", "n_tokens", ctx=64).collect()


def test_countmin_weighted_build_equals_instance_build(spark):
    """Building the sketch from a pre-aggregated (key, count) table
    must produce cell-identical results to the per-instance build."""
    import pyspark.sql.functions as F
    from emma_spark.llm import sketches as SK

    toks = spark.createDataFrame(
        [(t,) for t in "a b a c a b d e a".split()], "token string"
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    inst = {
        (r.row, r.bucket): r.cnt
        for r in SK.countmin_build(toks, "token", d=4, w=64).collect()
    }
    wght = {
        (r.row, r.bucket): r.cnt
        for r in SK.countmin_build(
            counts, "token", d=4, w=64, weight_col="n"
        ).collect()
    }
    assert inst == wght
