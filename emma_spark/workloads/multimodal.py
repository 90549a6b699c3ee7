"""Multimodal workload: the image feature pipeline end-to-end
(synthetic deterministic blobs — no media table in the harness data;
the decode seam is the documented stub, here the deterministic fake).

The fake featurizer is FNV-1a over the blob bytes, and the blob/meta
are synthesized from ``id`` with portable arithmetic — so the WHOLE
pipeline (synth -> metadata filter -> Arrow-batched mapInPandas decode
-> feature projection) has an exact DuckDB twin and a full value-hash
oracle, not just a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import multimodal as M
from . import query

# FNV-1a (32-bit) over the synthesized blob string, written as a DuckDB
# list_reduce — mirrors llm/multimodal._fake_decode byte-for-byte (the
# blob is pure ASCII and < 256 bytes, so the [:256] cap never bites).
_ORACLE = """
WITH imgs AS (
  SELECT id,
         'IMGBLOB:' || CAST(id AS VARCHAR) || ':'
           || repeat('x', CAST(id % 64 + 1 AS INT)) AS s,
         CAST((id + 7) * 2654435761 % 512 + 16 AS INT) AS w,
         CAST((id + 7) * 2654435789 % 512 + 16 AS INT) AS h
  FROM range(256) t(id)
), hashed AS (
  SELECT id, w, h,
    list_reduce(
      list_prepend(CAST(2166136261 AS HUGEINT),
                   list_transform(string_split(s, ''),
                                  c -> CAST(ord(c) AS HUGEINT))),
      (a, b) -> (xor(a, b) * 16777619) % 4294967296
    ) AS acc
  FROM imgs WHERE w >= 32
)
SELECT id,
       CAST(acc % 256 AS BIGINT)          AS b0,
       CAST((acc // 8) % 256 AS BIGINT)   AS b1,
       CAST((acc // 64) % 256 AS BIGINT)  AS b2,
       CAST((acc // 512) % 256 AS BIGINT) AS b3,
       CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       11 AS dim
FROM hashed
"""


@query("multimodal_image_features", oracle=_ORACLE)
def multimodal_image_features(spark, sf_dir):
    """Binary blobs + typed metadata → metadata filter (blob pruned at
    scan) → size-bucket partition key → Arrow-batched feature
    extraction → blob dropped before any shuffle.

    The fake featurizer emits bytes scaled to [0,1]; multiplying back
    by 255 and rounding recovers the exact integers, so the oracle
    compares in exact integer space (no cross-engine double rounding).
    """
    imgs = M.synth_image_table(spark, n=256)
    big = M.filter_by_meta(imgs, F.col("meta.width") >= 32)
    bucketed = big.withColumn("bucket", M.size_bucket(F.col("meta")))
    feats = M.image_features(bucketed)
    byte = lambda i: F.round(F.col("features")[i] * 255).cast("bigint")
    return feats.select(
        "id",
        byte(0).alias("b0"), byte(1).alias("b1"),
        byte(2).alias("b2"), byte(3).alias("b3"),
        F.col("features")[8].cast("bigint").alias("w"),
        F.col("features")[9].cast("bigint").alias("h"),
        F.size("features").cast("int").alias("dim"),
    )
