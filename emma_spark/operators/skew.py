"""Skew-aware joins: key salting.

No reference analog (emma delegates physical join strategy entirely to
the backend); this is the classic remedy for the case AQE's skew-join
splitting can't fix alone (one hot key whose rows exceed a single
executor's memory on BOTH sides of the shuffle).

Scheme: the skewed (large) side gets a uniform random salt in
[0, factor); the build (smaller) side is replicated once per salt
value; the join key becomes (key, salt). The hot key's rows now spread
over `factor` reducers. Replication multiplies the build side by
`factor` — use for moderate build sides or pair with broadcast for the
truly small ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    left_key: str,
    right_key: str | None = None,
    factor: int = 16,
    how: str = "inner",
    seed: int = 41,
) -> DataFrame:
    """Equi-join with the skewed side salted and the build side
    replicated ``factor`` times. Result == plain join (salt is internal).

    The salt is a seeded hash of the whole row, not rand(): retries /
    speculative re-execution of a task regenerate identical salts, so
    the join stays exactly-once-correct under failure."""
    right_key = right_key or left_key
    salt = F.pmod(
        F.xxhash64(F.struct(*[skewed[c] for c in skewed.columns]), F.lit(seed)),
        F.lit(factor),
    ).cast("int")
    l = skewed.withColumn("__salt", salt).alias("__l")
    r = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    ).alias("__r")
    cond = (F.col(f"__l.{left_key}") == F.col(f"__r.{right_key}")) & (
        F.col("__l.__salt") == F.col("__r.__salt")
    )
    out = l.join(r, cond, how).drop(F.col("__l.__salt"), F.col("__r.__salt"))
    if right_key == left_key:
        out = out.drop(F.col(f"__r.{right_key}"))  # match plain-join shape
    return out


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: heaviest keys with counts (run before choosing
    factor)."""
    return df.groupBy(key).count().orderBy(F.desc("count")).limit(n)
