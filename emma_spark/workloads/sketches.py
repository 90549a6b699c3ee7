"""Sketch workloads: Count-Min frequency estimation and Bloom
membership over the corpus tables, each with an exact-replay SQL
oracle (the sketches are md5-derived, so DuckDB reproduces every
bucket and bit — see llm/sketches.py's portability contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import sketches as SK
from ..llm.text import tokens
from ..sources import io
from . import query
from .text import SQL_TOKS, sql_md5_long

_CM_D, _CM_W = 4, 512
_BF_M, _BF_K = 8192, 3


def _sql_cm_bucket(row_expr: str, key_expr: str) -> str:
    h = sql_md5_long(f"concat('cm', CAST({row_expr} AS VARCHAR), '|', {key_expr})")
    return f"{h} % {_CM_W}"


def _sql_bf_pos(j_expr: str, key_expr: str) -> str:
    h = sql_md5_long(f"concat('bf', CAST({j_expr} AS VARCHAR), '|', {key_expr})")
    return f"{h} % {_BF_M}"


@query(
    "sketch_countmin_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({SQL_TOKS}) AS token FROM documents
    ), rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cms AS (
      SELECT row, bucket, count(*) AS cnt FROM (
        SELECT r.row AS row, {_sql_cm_bucket("r.row", "t.token")} AS bucket
        FROM toks t CROSS JOIN rows_ r
      ) GROUP BY row, bucket
    ),
    exact AS (
      SELECT token, count(*) AS exact FROM toks
      GROUP BY token HAVING count(*) >= 50
    ),
    est AS (
      SELECT e.token, min(coalesce(c.cnt, 0)) AS est
      FROM exact e CROSS JOIN rows_ r
      LEFT JOIN cms c
        ON c.row = r.row AND c.bucket = {_sql_cm_bucket("r.row", "e.token")}
      GROUP BY e.token
    )
    SELECT est.token, est.est, exact.exact
    FROM est JOIN exact ON est.token = exact.token
    """,
    headline=True,
)
def sketch_countmin_tokens(spark, sf_dir):
    """Count-Min sketch of corpus token frequencies (d=4 × w=512)
    next to the exact counts for the heavy tokens (≥ 50 occurrences):
    est ≥ exact always, equal when some row is collision-free. The
    sketch build is one d·w-cell shuffle regardless of corpus size;
    the probe join broadcasts the sketch (llm/sketches.py)."""
    docs = io.read_parquet(spark, f"{sf_dir}/documents.parquet").df
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    cms = SK.countmin_build(toks, "token", d=_CM_D, w=_CM_W)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact"))
        .filter(F.col("exact") >= 50)
    )
    est = SK.countmin_estimate(
        cms, exact.select("token"), "token", d=_CM_D, w=_CM_W
    )
    return est.join(exact, "token").select("token", "est", "exact")


@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH js AS (SELECT unnest([0, 1, 2]) AS j),
    bits AS (
      SELECT DISTINCT {_sql_bf_pos("j.j", "CAST(o.o_custkey AS VARCHAR)")} AS pos
      FROM orders o CROSS JOIN js j
    ),
    probes AS (SELECT c_custkey * 3 AS probe_key FROM customer),
    hits AS (
      SELECT p.probe_key, count(b.pos) AS nhit
      FROM probes p CROSS JOIN js j
      LEFT JOIN bits b
        ON b.pos = {_sql_bf_pos("j.j", "CAST(p.probe_key AS VARCHAR)")}
      GROUP BY p.probe_key
    )
    SELECT h.probe_key, h.nhit = {_BF_K} AS maybe_present,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = h.probe_key)
             AS actually_present
    FROM hits h
    """,
)
def sketch_bloom_membership(spark, sf_dir):
    """Bloom-filter membership (m=8192, k=3) of order custkeys, probed
    with c_custkey·3 (≈⅓ true members) and laid next to ground truth:
    no false negatives by construction; the false-positive rows are
    the sketch's documented error. Build and probe are both broadcast
    joins against the ≤ m-row bit set — the orders side is the only
    scan at scale."""
    t = io.load_tables(spark, sf_dir, "orders", "customer")
    o, c = t["orders"].df, t["customer"].df
    bloom = SK.bloom_build(o.select("o_custkey"), "o_custkey", m=_BF_M, k=_BF_K)
    probes = c.select((F.col("c_custkey") * 3).alias("probe_key"))
    got = SK.bloom_contains(bloom, probes, "probe_key", m=_BF_M, k=_BF_K)
    members = o.select(F.col("o_custkey").alias("probe_key")).distinct()
    return (
        got.join(
            members.withColumn("__m", F.lit(1)), ["probe_key"], "left"
        )
        .select(
            "probe_key",
            F.col("maybe_present"),
            F.col("__m").isNotNull().alias("actually_present"),
        )
    )
