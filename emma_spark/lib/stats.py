"""Elementwise statistics over a vector column (``array<double>``).

Reference: ``emma-lib/.../lib/stats/stat.scala:23-62`` — count / sum /
min / max / mean / variance / stddev over ``DataBag[DVector]`` via
custom vector algebras (``salg.scala:30-48``).

Spark-first lowering: cross-row elementwise aggregation is
``posexplode`` → ``groupBy(pos)`` → built-in agg → re-assemble. That
is a real shuffle, but of exactly D keys with map-side partial
aggregation — at 100 TB each of the D partitions reduces its slice in
parallel and only D rows exist post-agg. No Python, no driver funnel,
no collect except the final D-row vector (explicitly driver-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _elementwise(df: DataFrame, vec: str | Column, aggs: dict[str, Column]) -> DataFrame:
    """posexplode the vector, aggregate per position, one row per pos.

    ``aggs`` maps output name -> aggregate over column ``v``."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    e = df.select(F.posexplode(vec).alias("pos", "v"))
    return e.groupBy("pos").agg(*[c.alias(n) for n, c in aggs.items()])


def _to_vector(per_pos: DataFrame, col: str) -> list[float]:
    rows = per_pos.select("pos", col).orderBy("pos").collect()
    return [r[col] for r in rows]


def vsum(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    """(``stat.scala:29-30``; algebra ``salg.Sum`` ``salg.scala:32-36``)."""
    return _to_vector(_elementwise(df, vec, {"s": F.sum("v")}), "s")


def vmin(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    return _to_vector(_elementwise(df, vec, {"m": F.min("v")}), "m")


def vmax(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    return _to_vector(_elementwise(df, vec, {"m": F.max("v")}), "m")


def vmean(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    """sum * (1/count) (``stat.scala:38-40``) — one fused pass here."""
    return _to_vector(_elementwise(df, vec, {"m": F.avg("v")}), "m")


def vvariance(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    """Population variance per dimension (``stat.scala:42-55``: mean of
    squared deviations). Single pass via E[x²] − E[x]²-free var_pop."""
    return _to_vector(_elementwise(df, vec, {"v": F.var_pop("v")}), "v")


def vstddev(df: DataFrame, vec: str | Column = "vec") -> list[float]:
    """(``stat.scala:57-62``)."""
    return [v ** 0.5 for v in vvariance(df, vec)]


def summarize(df: DataFrame, vec: str | Column = "vec") -> DataFrame:
    """All moments in ONE distributed pass (fold-forest fusion of the
    vector algebras — ``summarize.scala`` analog): returns a D-row
    DataFrame (pos, count, sum, min, max, mean, variance, stddev).
    Stays distributed — collect is the caller's choice."""
    per = _elementwise(
        df,
        vec,
        {
            "count": F.count("v"),
            "sum": F.sum("v"),
            "min": F.min("v"),
            "max": F.max("v"),
            "mean": F.avg("v"),
            "variance": F.var_pop("v"),
        },
    )
    return per.withColumn("stddev", F.sqrt(F.col("variance"))).orderBy("pos")
