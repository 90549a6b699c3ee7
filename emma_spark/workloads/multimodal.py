"""Multimodal workload: the image feature pipeline end-to-end
(synthetic deterministic blobs — no media table in the harness data;
the decode seam is the documented stub, here the deterministic fake).
Rows-only check: mapInPandas feature extraction is not SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import multimodal as M
from . import query


@query("multimodal_image_features", oracle=None)
def multimodal_image_features(spark, sf_dir):
    """Binary blobs + typed metadata → metadata filter (blob pruned at
    scan) → size-bucket partition key → Arrow-batched feature
    extraction → blob dropped before any shuffle."""
    imgs = M.synth_image_table(spark, n=256)
    big = M.filter_by_meta(imgs, F.col("meta.width") >= 32)
    bucketed = big.withColumn("bucket", M.size_bucket(F.col("meta")))
    feats = M.image_features(bucketed)
    return feats.select("id", F.round(F.col("features")[0], 6).alias("f0"),
                        F.size("features").alias("dim"))
