"""Hypertable rollup — multi-resolution time-bucket aggregates where
each coarser level re-aggregates the next finer level's PARTIALS
instead of rescanning raw data.

The 100 TB pattern (TimescaleDB continuous aggregates / OLAP rollup
cubes): raw events are aggregated ONCE at the finest grain; every
coarser resolution consumes the finer aggregate — cost proportional to
the finer level's cardinality (buckets x keys), not the raw row count.
This only works for decomposable aggregates, so levels carry the
partial set (count, sum, min, max) and presentation-layer stats (avg)
are derived at read time as sum/count.

No reference analog (emma has no time-series surface); a new scale
capability alongside asof/range/skew in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def rollup_level(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: list[str],
    value_col: str,
    from_partials: bool = False,
) -> DataFrame:
    """One rollup level: aggregate into ``bucket``-sized time buckets.

    ``from_partials=False``: input is raw rows (one count/sum/min/max
    pass). ``from_partials=True``: input is a finer level produced by
    this function — partials are merged (sum of counts/sums, min of
    mins, max of maxes), never recomputed from raw.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    if not from_partials:
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("v_sum"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
        ]
    else:
        aggs = [
            F.sum("n").alias("n"),
            F.sum("v_sum").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        ]
    return df.groupBy(b, *keys).agg(*aggs)


def hyper_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    buckets: list[str] = ["hour", "day", "week"],
) -> dict[str, DataFrame]:
    """Build the full resolution ladder. ``buckets`` must be ordered
    fine -> coarse (each must evenly contain the previous). Returns
    {bucket: aggregate DataFrame}; every level after the first reads
    the previous level (its plan — persist the finest level when
    materializing all of them in one job)."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for b in buckets:
        src = df if prev is None else prev
        lvl = rollup_level(
            src,
            ts_col if prev is None else "bucket_ts",
            b,
            keys,
            value_col,
            from_partials=prev is not None,
        )
        out[b] = lvl
        prev = lvl
    return out


def grand_total_on_empty(res: DataFrame, src: DataFrame, filler) -> DataFrame:
    """Restore the SQL-standard ``()`` grouping set over EMPTY input.

    Standard CUBE / ROLLUP / GROUPING SETS lattices always contain the
    global ``()`` set, so zero input rows still yield ONE grand-total
    row (count 0, empty-set sums NULL). Spark expands grouping sets
    map-side over the input rows (Expand operator), so an empty scan
    emits NOTHING — the one lattice row a day-one empty partition owes
    its consumers silently disappears.

    ``filler`` is the literal grand-total row (one Column per output
    column of ``res``, aliased and cast to the exact result types); it
    survives only when ``src`` is empty, via an anti-join against a
    broadcast 1-row probe of ``src``. The probe is ``LIMIT 1`` over a
    literal projection — column-pruned and short-circuited at the
    first row, so at 100 TB it costs one partition read, and the
    anti-join is a 1x1-bounded BroadcastNestedLoopJoin (the documented
    bounded class, never a CartesianProduct over data).
    """
    probe = src.select(F.lit(1).alias("__probe")).limit(1)
    one = res.sparkSession.range(1).select(*filler)
    return res.unionByName(one.join(F.broadcast(probe), F.lit(True), "left_anti"))
