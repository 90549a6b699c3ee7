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


def split_hash(df: DataFrame, k: int, key_cols: list[str], seed: int = 13,
               fold_col: str = "fold_id") -> DataFrame:
    """Equal-fraction k-fold assignment by a PORTABLE content hash
    (first 56 bits of md5 over the seed-salted key columns, mod k) —
    the oracle-checkable variant of :func:`split`: any engine with md5
    reproduces the folds bit-for-bit (DuckDB:
    ``CAST(concat('0x', substr(md5(concat_ws(chr(31), keys..., seed)),
    1, 14)) AS BIGINT) % k``). Deterministic per content, stable under
    repartitioning."""
    joined = F.concat_ws(
        "\x1f",
        *[F.coalesce(df[c].cast("string"), F.lit("\x01")) for c in key_cols],
        F.lit(str(seed)),
    )
    h = F.conv(F.substring(F.md5(F.encode(joined, "utf-8")), 1, 14), 16, 10).cast("bigint")
    return df.withColumn(fold_col, (h % k).cast("int"))


def select(splits: DataFrame, k: int, fold_col: str = "fold_id") -> DataFrame:
    """Entries of fold k (test split)."""
    return splits.filter(F.col(fold_col) == k).drop(fold_col)


def excluding(splits: DataFrame, k: int, fold_col: str = "fold_id") -> DataFrame:
    """Entries of all folds but k (train split) — `except` in the
    reference (renamed: Python keyword)."""
    return splits.filter(F.col(fold_col) != k).drop(fold_col)
