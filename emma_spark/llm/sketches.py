"""Deterministic distributed sketches: Count-Min and Bloom.

Both sketches are built from the portable 56-bit md5 hash
(:func:`emma_spark.llm.text.md5_long`), so every engine — and every
partitioning of the same engine — produces the SAME sketch bit-for-bit
and an ANSI-SQL oracle can replay estimates exactly. That is the same
portability contract as the KMV sketch (text.kmv_distinct_estimate):
HLL/theta register layouts are implementation-defined and can never be
cross-checked; a hash-derived table of (row, bucket, count) can.

Reference anchor: the reference ships fold-based aggregation algebra
(``emma-language/.../api/alg/Alg.scala``) but no sketches; these are
the 100 TB training-data-pipeline additions (count frequencies and
membership at corpus scale without a per-key shuffle of the raw data).

Scale design:
- Build is ONE shuffle of (row, bucket) pairs — d×|input| rows map-side
  reduced to at most d·w sketch cells; w and d are constants, so the
  sketch itself is broadcast-sized no matter how big the corpus.
- Estimate joins the probe keys against the d·w-cell sketch — a
  broadcast hash join, no shuffle of the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import md5_long


def countmin_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Count-Min sketch of key frequencies: ``d`` hash rows × ``w``
    buckets. Returns (row, bucket, cnt) — at most d·w rows.

    Each input key lands in bucket ``md5('cm{i}|'||key) % w`` of every
    row i; the build explodes the d (row, bucket) pairs map-side and
    hash-aggregates — partial combine keeps the shuffle at d·w cells
    per map task regardless of input size."""
    pairs = [
        F.struct(
            F.lit(i).alias("row"),
            (md5_long(F.col(key_col).cast("string"), salt=f"cm{i}") % w).alias(
                "bucket"
            ),
        )
        for i in range(d)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("__p"))
        .select("__p.*")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame, probes: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Point-frequency estimates: est(key) = min over rows i of the
    key's bucket count. Always ≥ the true count (collisions only ever
    add); equality when no collision in at least one row. The sketch
    side is d·w rows — broadcast, so the probe side never shuffles."""
    pairs = [
        F.struct(
            F.lit(i).alias("row"),
            (md5_long(F.col(key_col).cast("string"), salt=f"cm{i}") % w).alias(
                "bucket"
            ),
        )
        for i in range(d)
    ]
    exploded = probes.select(
        F.col(key_col), F.explode(F.array(*pairs)).alias("__p")
    ).select(key_col, "__p.*")
    return (
        exploded.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_build(df: DataFrame, key_col: str, m: int = 8192, k: int = 3) -> DataFrame:
    """Bloom filter as a DISTINCT set of set bit positions (≤ m rows,
    one per set bit): position_j(key) = md5('bf{j}|'||key) % m for
    j < k. A position table instead of a packed bitmap keeps the
    structure relational (joinable, SQL-replayable) while carrying
    identical information; at m=8192 it is broadcast-sized."""
    pos = [
        (md5_long(F.col(key_col).cast("string"), salt=f"bf{j}") % m).alias("pos")
        for j in range(k)
    ]
    return (
        df.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )


def bloom_contains(
    bloom: DataFrame, probes: DataFrame, key_col: str, m: int = 8192, k: int = 3
) -> DataFrame:
    """Membership probe: maybe-present iff ALL k positions are set
    (count of matched positions == k). No false negatives; false
    positives at the classic (1-e^{-kn/m})^k rate. Broadcast join
    against the ≤ m-row position set; probe side stays partitioned."""
    pos = [
        (md5_long(F.col(key_col).cast("string"), salt=f"bf{j}") % m).alias("pos")
        for j in range(k)
    ]
    exploded = probes.select(F.col(key_col), F.explode(F.array(*pos)).alias("pos"))
    hit = F.lit(1)
    return (
        exploded.join(F.broadcast(bloom.withColumn("__set", hit)), ["pos"], "left")
        .groupBy(key_col)
        .agg((F.count(F.col("__set")) == k).alias("maybe_present"))
    )
