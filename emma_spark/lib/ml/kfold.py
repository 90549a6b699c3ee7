"""k-fold splitting by fraction vector.

Reference semantics: ``emma-lib/.../ml/kfold.scala`` — normalize
`fractions` to a pdf, build the cdf, assign each element the fold
whose cdf bucket contains a seeded uniform draw; `except(k)` /
`select(k)` filter on the fold id.

Spark-first: the uniform draw is a seeded xxhash64 of the row mapped
to [0,1) — pure expression, deterministic per content, no
zipWithIndex round-trip, stable under repartitioning (stronger than
the reference's index-based contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split(df: DataFrame, fractions: list[float], seed: int = 631431513,
          fold_col: str = "fold_id") -> DataFrame:
    fsum = sum(fractions)
    pdf = [x / fsum for x in fractions]
    assert all(0 < x < 1 for x in pdf), "fractions must be in (0, 1) after normalization"
    cdf = []
    acc = 0.0
    for p in pdf[:-1]:
        acc += p
        cdf.append(acc)

    h = F.xxhash64(F.struct(*[df[c] for c in df.columns]), F.lit(seed))
    # map int64 hash to [0, 1)
    u = (h.cast("double") / F.lit(2.0 ** 64)) + F.lit(0.5)
    expr = F.lit(len(pdf) - 1)
    for i in reversed(range(len(cdf))):
        expr = F.when(u < cdf[i], F.lit(i)).otherwise(expr)
    return df.withColumn(fold_col, expr)


def select(splits: DataFrame, k: int, fold_col: str = "fold_id") -> DataFrame:
    """Entries of fold k (test split)."""
    return splits.filter(F.col(fold_col) == k).drop(fold_col)


def excluding(splits: DataFrame, k: int, fold_col: str = "fold_id") -> DataFrame:
    """Entries of all folds but k (train split) — `except` in the
    reference (renamed: Python keyword)."""
    return splits.filter(F.col(fold_col) != k).drop(fold_col)
