"""Streaming workloads: real Structured Streaming runs drained to a
batch result via availableNow (the driver's harness is batch-only).

The stream source is the events table re-staged to a temp dir through
the engine's own IO (micros timestamps); results are deterministic,
so the tumbling-count query carries a full SQL oracle.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ..sources import io
from ..streaming import api as S
from . import query


def _stage_events(spark, sf_dir: str) -> str:
    """Write events to a session-scoped temp dir (streaming file
    sources read directories)."""
    src = f"{sf_dir}/events.parquet"
    stamp = f"{os.path.getmtime(src):.0f}_{os.path.getsize(src)}_v2"
    staged = os.path.join(
        tempfile.gettempdir(), f"emma_stream_{abs(hash((sf_dir, stamp)))}"
    )
    marker = os.path.join(staged, "_SUCCESS")
    if not os.path.exists(marker):
        io.read_parquet(spark, f"{sf_dir}/events.parquet").df.write.mode(
            "overwrite"
        ).parquet(staged)
    return staged


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, event_type,
           count(*) AS n,
           sum(floor(value * 10000 + 0.5)) / 10000 AS total
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def stream_tumbling_counts(spark, sf_dir):
    """Tumbling-window streaming aggregation, drained with an
    availableNow trigger into a memory sink — the stream computes the
    same answer as the batch/SQL oracle (complete mode: every window
    in state is emitted; at scale a watermark bounds that state —
    covered in tests)."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, spark.read.parquet(staged).schema)
    agg = S.tumbling(stream, "ts", "1 hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))) / 10000).alias("total"),
    )
    name = f"stream_tc_{uuid.uuid4().hex[:8]}"
    # state keys = hourly windows x event types (~10^3 at sf0.1): a few
    # state-store partitions, not the batch-shuffle default of 32
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name).select(
        F.col("window.start").alias("win_start"), "event_type", "n", "total"
    )
