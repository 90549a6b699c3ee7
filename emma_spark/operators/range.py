"""Range (interval-containment) join without a nested-loop plan.

Spark plans a bare non-equi condition ``p BETWEEN lo AND hi`` as a
BroadcastNestedLoopJoin — O(|points| x |intervals|) compare work, and
only viable while one side broadcasts. The scalable shape is
bucketization: quantize the value domain into fixed-width buckets,
explode each interval to the buckets it covers, tag each point with
its single bucket, equi-join on the bucket id, then re-check the exact
predicate. The join becomes a plain shuffle/broadcast HASH join whose
cost is O(|points| + |intervals| x spread + matches).

No reference analog (emma expresses theta joins as cross + filter,
``Combination.scala:125-145`` — the same quadratic shape); this is a
new scale capability, like the as-of join (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
    inclusive_hi: bool = True,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``bucket_width`` trades explode fan-out against bucket selectivity:
    pick it near the TYPICAL interval length, so each interval lands in
    O(1) buckets while a bucket only meets the handful of intervals
    overlapping it. Every point belongs to exactly ONE bucket, so no
    dedup is needed — each (point, interval) match is produced once,
    by the bucket containing the point.
    """
    w = float(bucket_width)
    b_pt = F.floor(F.col(point_col) / w)
    b_lo = F.floor(F.col(lo_col) / w)
    b_hi = F.floor(F.col(hi_col) / w)

    iv = intervals.withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    pt = points.withColumn("__bucket", b_pt)

    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(point_col) < F.col(hi_col)
    )
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (F.col(point_col) >= F.col(lo_col))
        & hi_ok
    )
    return pt.join(iv, cond, how).drop("__bucket")
