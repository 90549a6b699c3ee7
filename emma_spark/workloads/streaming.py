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
    # _v3: staged timestamp type changed (NTZ→LTZ normalization in
    # io.read_parquet) — older staged dirs carry NTZ ts columns that
    # withWatermark rejects, so they must not be reused
    stamp = f"{os.path.getmtime(src):.0f}_{os.path.getsize(src)}_v3"
    staged = os.path.join(
        tempfile.gettempdir(), f"emma_stream_{abs(hash((sf_dir, stamp)))}"
    )
    marker = os.path.join(staged, "_SUCCESS")
    if not os.path.exists(marker):
        io.read_parquet(spark, f"{sf_dir}/events.parquet").df.write.mode(
            "overwrite"
        ).parquet(staged)
    return staged


# staged-dir schema memo (r13): every streaming query re-inferred the
# pinned source schema by re-reading the staged dir's parquet footer —
# a footer read + py4j analysis round per query BUILD. The staged dir
# is content-stamped (mtime+size+version in its name) and written
# exactly once by _stage_events, so its schema is immutable per path —
# pure METADATA keyed by a content stamp, never query results.
_staged_schemas: dict[str, object] = {}


def _staged_schema(spark, staged: str):
    sch = _staged_schemas.get(staged)
    if sch is None:
        sch = spark.read.parquet(staged).schema
        _staged_schemas[staged] = sch
    return sch


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
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    agg = S.tumbling(stream, "ts", "1 hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))) / 10000).alias("total"),
    )
    name = f"stream_tc_{uuid.uuid4().hex[:8]}"
    # state keys = hourly windows x event types (~3.6k — CONSTANT in SF:
    # the corpus time range and type set are fixed, only rows/key grow,
    # and the pre-shuffle partial agg collapses those): a couple of
    # state-store partitions, not the batch-shuffle default of 32.
    # r13 A/B (exclusive, min-of-4): sp4 1.08s / sp2 0.92s / sp1 0.83s —
    # per-partition store setup+commit dominates at this key count; 2
    # keeps parallel headroom at the same cost as 1.
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=2)
    return spark.table(name).select(
        F.col("window.start").alias("win_start"), "event_type", "n", "total"
    )


@query(
    "stream_watermark_append",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, event_type,
           count(*) AS n,
           sum(floor(value * 10000 + 0.5)) / 10000 AS total
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    HAVING win_start + INTERVAL 1 HOUR < (SELECT max(ts) - INTERVAL 37 MINUTE
                                          FROM events
                                          WHERE value IS NOT NULL)
    """,
    headline=True,
)
def stream_watermark_append(spark, sf_dir):
    """The production streaming shape: watermark + APPEND mode — state
    for windows older than max(event time) − 37 min is finalized,
    emitted once, and EVICTED, so state stays bounded on an unbounded
    stream (complete mode, by contrast, retains every window forever).

    Determinism: availableNow drains the input, then a no-data
    micro-batch advances the watermark and flushes every finalized
    window; exactly the windows with end < max(ts) − delay are
    emitted, which the oracle's HAVING clause mirrors. The 37-minute
    delay is deliberately hour-misaligned so the strict-< boundary
    can't land exactly on a window edge.

    The watermark domain contract is ENFORCED, not assumed: the
    stream goes through quarantine_out_of_band before with_watermark,
    so corrupt event times on BOTH sides of the band are split off as
    a dead-letter leg instead of vanishing — pre-epoch / NULL (which
    a watermarked agg silently drops) AND far-future (which poisons
    the checkpointed watermark so every LATER real row drops forever
    in a restart-resume deployment; the 7-day lead bound is the
    producer-clock-skew allowance — event time may not lead
    processing time, arbitrarily LATE rows stay valid). This corpus
    has neither, so the valid leg is the whole table and the oracle
    is unchanged; the filter is a pushed narrow predicate, not a
    shuffle.

    The COLUMN face of the contract (r11 judge find, r12):
    quarantine_required("value") — the summed measure is a REQUIRED
    column, so a producer renaming/dropping it mid-stream (which the
    parquet file source null-fills SILENTLY: correct n, NULL total,
    forever) becomes a 100 %-quarantined dead-letter batch instead;
    the same leg observes ordinary per-row NULL-measure corruption,
    which the oracle mirrors (IS NOT NULL in the window sum AND the
    watermark subquery — the watermark advances on VALID rows only).
    Certified by the restart tier's DRIFT pass
    (tools/fuzzcheck_restart.py)."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    valid, _quarantine = S.quarantine_out_of_band(stream, "ts", "7 days")
    valid, _null_required = S.quarantine_required(valid, "value")
    wm = S.with_watermark(valid, "ts", "37 minutes")
    agg = S.tumbling(wm, "ts", "1 hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))) / 10000).alias("total"),
    )
    name = f"stream_wm_{uuid.uuid4().hex[:8]}"
    # state_partitions: same constant-key argument and A/B as
    # stream_tumbling_counts (sp4 1.29s / sp2 1.07s / sp1 1.10s)
    S.run_to_memory(agg, name, output_mode="append", state_partitions=2)
    return spark.table(name).select(
        F.col("window.start").alias("win_start"), "event_type", "n", "total"
    )


@query(
    "stream_keyed_state_counts",
    oracle="SELECT user_id, count(*) AS n FROM events GROUP BY user_id",
)
def stream_keyed_state_counts(spark, sf_dir):
    """Arbitrary keyed state over a stream (applyInPandasWithState —
    the MutableBag.update analog, api/MutableBag.scala:28-44): per-user
    running event counts. State is partitioned by key across executors;
    max(n) per key after the drain picks the final running value, so
    the result is exact regardless of how availableNow batches the
    input. Full SQL oracle: final state == batch groupBy count."""
    import pandas as pd

    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    stream = S.read_stream_parquet(spark, staged, schema)

    def update(key, pdf_iter, state):
        cnt = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [cnt]})

    out = S.keyed_state(
        stream,
        keys=["user_id"],
        func=update,
        state_schema="n bigint",
        output_schema="user_id bigint, n bigint",
        output_mode="update",
    )
    name = f"stream_ks_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(out, name, output_mode="update", state_partitions=4)
    return spark.table(name).groupBy("user_id").agg(F.max("n").alias("n"))


@query(
    "stream_stream_interval_join",
    oracle="""
    SELECT p.event_id AS pid, p.user_id, c.event_id AS cid
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def stream_stream_interval_join(spark, sf_dir):
    """STREAM-STREAM join (purchases enriched with each click from the
    preceding hour, per user) — the production shape: watermarks on
    BOTH sides + a time-interval join condition, which together bound
    join state (a side's row evicts once the other watermark clears
    its interval). Inner matches emit on arrival (append mode), so the
    drained result equals the batch interval join, which is the
    oracle."""
    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    p = (
        S.with_watermark(S.read_stream_parquet(spark, staged, schema), "ts", "2 hours")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts"))
    )
    c = (
        S.with_watermark(S.read_stream_parquet(spark, staged, schema), "ts", "2 hours")
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("cid"), F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("p_ts - interval 1 hour"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    name = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(j.select("pid", "user_id", "cid"), name,
                    output_mode="append", state_partitions=4)
    return spark.table(name)


@query(
    "stream_session_windows",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id, min(ts) AS win_start, count(*) AS n
    FROM sess GROUP BY user_id, sid
    HAVING max(ts) + INTERVAL 30 MINUTE < (SELECT max(ts) - INTERVAL 37 MINUTE
                                           FROM events)
    """,
)
def stream_session_windows(spark, sf_dir):
    """Streaming SESSION windows (gap-merged, watermark + append): per
    user, events within 30 min of each other merge into one session;
    a session finalizes — is emitted once and its state evicted — when
    the watermark passes its end (last event + gap).

    Oracle: classic gaps-and-islands sessionization with Spark's exact
    merge rule (a gap of EXACTLY the duration starts a new session,
    because session windows are half-open [start, last+gap)), keeping
    sessions whose end clears the final watermark. The 37-minute delay
    is micro-second-misaligned with event times, so the boundary
    comparison cannot tie."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    wm = S.with_watermark(stream, "ts", "37 minutes")
    agg = S.session(wm, "ts", "30 minutes", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"stream_sw_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="append", state_partitions=4)
    return spark.table(name).select(
        "user_id", F.col("window.start").alias("win_start"), "n"
    )


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark, sf_dir):
    """Streaming deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key only until
    the watermark clears the key's event time, so dedup state evicts
    continuously on an unbounded stream (plain dropDuplicates grows
    state forever). Projecting to the key columns makes the emitted
    set deterministic (first-arrival races only affect non-key
    columns, which are dropped): exactly the distinct keys, which is
    the oracle. NOTE: within-watermark dedup guarantees single
    emission only for duplicates closer than the delay — duplicates
    separated further may re-emit, hence the final distinct()."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    wm = S.with_watermark(stream, "ts", "2 hours").select("user_id", "event_type", "ts")
    dd = wm.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    name = f"stream_dd_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(dd.select("user_id", "event_type"), name,
                    output_mode="append", state_partitions=4)
    return spark.table(name).distinct()


@query(
    "stream_sliding_counts",
    oracle="""
    WITH w AS (
      SELECT unnest([time_bucket(INTERVAL 1 HOUR, ts),
                     time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR]) AS win_start,
             event_type
      FROM events
    )
    SELECT win_start, event_type, count(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Sliding-window streaming aggregation (2 h windows sliding 1 h):
    every event lands in duration/slide = 2 windows. The oracle unrolls
    the window membership explicitly — the two window starts covering
    each event — and must produce the identical (window, type, count)
    multiset."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    agg = S.sliding(stream, "ts", "2 hours", "1 hour", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"stream_sl_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name).select(
        F.col("window.start").alias("win_start"), "event_type", "n"
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, e.ts) AS win_start,
           c.c_mktsegment, count(*) AS n,
           sum(floor(e.value * 10000 + 0.5)) / 10000 AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static join: the event stream enriched against the
    static customer dim (the standard streaming-ETL lookup shape —
    Structured Streaming re-plans the static side per micro-batch, so
    a broadcast hint keeps it a map-side hash join with NO stream
    shuffle before the windowed agg). Windowed counts + quantized sum
    per market segment; oracle is the batch join."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    dim = F.broadcast(
        io.read_parquet(spark, f"{sf_dir}/customer.parquet").df.select(
            F.col("c_custkey"), F.col("c_mktsegment")
        )
    )
    joined = stream.join(dim, stream["user_id"] == dim["c_custkey"])
    agg = S.tumbling(joined, "ts", "1 hour", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))) / 10000).alias("total"),
    )
    name = f"stream_se_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name).select(
        F.col("window.start").alias("win_start"), "c_mktsegment", "n", "total"
    )


@query(
    "stream_state_ttl_closed",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id, count(*) AS n
    FROM events CROSS JOIN mx
    GROUP BY user_id, mx.m
    HAVING max(ts) < mx.m - INTERVAL 90 MINUTE
    """,
)
def stream_state_ttl_closed(spark, sf_dir):
    """Event-time state TTL — sessions CLOSED by watermark eviction:
    per-user state registers a timeout at (last event + 30 min); the
    availableNow drain plus the terminal no-data micro-batch advance
    the watermark to max(ts) − 1 h, so exactly the users idle longer
    than 90 min before the stream end emit a final closed record and
    their state is FREED (the unbounded-key survival story: state
    size tracks the ACTIVE keys, not all keys ever seen). The oracle
    replays the eviction rule in SQL. Closed rows are summed per user
    before the compare: if the drain runs >1 micro-batch a user can be
    evicted mid-stream and re-close at end-of-stream with the count
    split across two rows — the sum is batch-boundary-invariant
    (single-file staging keeps availableNow to one batch today, but
    correctness must not hang on that)."""
    import pandas as pd

    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    stream = S.with_watermark(
        S.read_stream_parquet(spark, staged, schema), "ts", "1 hour"
    )

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            (cnt, _last) = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "n": [cnt], "closed": [True]})
            return
        cnt, last_ms = (state.get if state.exists else (0, 0))
        for pdf in pdf_iter:
            cnt += len(pdf)
            if len(pdf):
                last_ms = max(last_ms, int(pdf["ts"].max().timestamp() * 1000))
        state.update((cnt, last_ms))
        state.setTimeoutTimestamp(last_ms + 30 * 60 * 1000)
        yield pd.DataFrame({"user_id": [key[0]], "n": [cnt], "closed": [False]})

    out = S.keyed_state(
        stream,
        keys=["user_id"],
        func=update,
        state_schema="n bigint, last_ms bigint",
        output_schema="user_id bigint, n bigint, closed boolean",
        output_mode="update",
        timeout="EventTimeTimeout",
    )
    name = f"stream_ttl_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(out, name, output_mode="update", state_partitions=4)
    return (
        spark.table(name)
        .filter(F.col("closed"))
        .groupBy("user_id")
        .agg(F.sum("n").alias("n"))
    )


@query(
    "stream_hll_windowed_distinct",
    oracle="""
    WITH hashed AS (
      -- user_id IS NOT NULL: NULL keys are invisible to a distinct
      -- count (mirrors llm/sketches.hll_register_table; r10
      -- NULL-user_id events fuzz)
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
             CAST(concat('0x', substr(md5(concat('hll', '|',
               CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hh
      FROM events WHERE user_id IS NOT NULL
    ), regs AS (
      SELECT win_start, hh % 512 AS register,
             CASE WHEN hh // 512 = 0 THEN 48
                  ELSE 48 - length(bin(hh // 512)) END AS rank
      FROM hashed
    ), mx AS (
      SELECT win_start, register, max(rank) AS max_rank
      FROM regs GROUP BY win_start, register
    ), z AS (
      SELECT win_start,
             sum((1::BIGINT << (48 - max_rank))::HUGEINT) AS zu,
             count(*) AS n_used
      FROM mx GROUP BY win_start
    )
    SELECT win_start, n_used,
           CAST(CAST('272499435527510007411113984' AS HUGEINT) //
                (5130790::HUGEINT *
                 (zu + (512 - n_used) * (1::BIGINT << 48)::HUGEINT))
                AS BIGINT) AS est_distinct,
           x.exact_distinct
    FROM z JOIN (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws,
             count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1
    ) x ON z.win_start = x.ws
    """,
)
def stream_hll_windowed_distinct(spark, sf_dir):
    """Streaming distinct-user estimation: the portable HLL register
    sketch maintained BY Structured Streaming — per hour window the
    stateful agg is groupBy(window, register).max(rank), bounded at
    m=512 cells per window regardless of event volume (the
    unbounded-distinct problem that exact streaming countDistinct
    cannot survive; Spark refuses it in append mode for this reason).
    Registers stream with a watermark; the estimate (exact integer
    math, llm/sketches.hll_estimate) is read off the drained register
    state batch-side, next to the exact per-window distinct as ground
    truth. Oracle replays registers AND estimate bit-for-bit."""
    from ..llm import sketches as SK
    from ..llm.text import md5_long

    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    m, s_bits = 512, 48
    h = md5_long(F.col("user_id").cast("string"), salt="hll")
    # NULL keys are invisible to a distinct count (the register-table
    # contract, llm/sketches.hll_register_table — this site builds its
    # registers inline for the streaming agg)
    stream = stream.filter(F.col("user_id").isNotNull())
    hashed = stream.select(
        F.col("ts"), F.pmod(h, F.lit(m)).alias("register"), h.alias("__h")
    ).select(
        "ts", "register",
        F.when(F.expr(f"__h div {m}") == 0, F.lit(s_bits))
        .otherwise(F.lit(s_bits) - F.length(F.bin(F.expr(f"__h div {m}"))))
        .alias("rank"),
    )
    agg = S.tumbling(hashed, "ts", "1 hour", "register").agg(
        F.max("rank").alias("max_rank")
    )
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    regs = spark.table(name).select(
        F.col("window.start").alias("win_start"), "register", "max_rank"
    )
    est = SK.hll_estimate(regs, "win_start", p=9)
    exact = (
        io.read_parquet(spark, f"{sf_dir}/events.parquet").df
        .select(F.window("ts", "1 hour").alias("w"), "user_id")
        .groupBy(F.col("w.start").alias("ws"))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, est["win_start"] == exact["ws"]).select(
        "win_start", "n_used", "est_distinct", "exact_distinct"
    )


@query(
    "stream_quantile_bins_windowed",
    oracle="""
    WITH pc AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
             least(CAST(floor(value * 100 + 0.5) AS BIGINT) * 128 // 100000,
                   127) AS bin
      FROM events
    ), binned AS (
      SELECT win_start, bin, count(*) AS cnt FROM pc GROUP BY win_start, bin
    ), mm AS (
      SELECT win_start, sum(cnt) AS n FROM binned GROUP BY win_start
    ), cum AS (
      SELECT win_start, bin,
             sum(cnt) OVER (PARTITION BY win_start ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM binned
    ), qs AS (SELECT unnest([50, 90]) AS q_pct),
    hit AS (
      SELECT c.win_start, q.q_pct, min(c.bin) AS bin
      FROM qs q
      JOIN mm ON true
      JOIN cum c ON c.win_start = mm.win_start
                AND c.cum >= (mm.n * q.q_pct + 99) // 100
      GROUP BY c.win_start, q.q_pct
    )
    SELECT win_start, q_pct, ((bin + 1) * 100000 // 128) AS approx_c
    FROM hit
    """,
)
def stream_quantile_bins_windowed(spark, sf_dir):
    """Streaming per-window quantiles via the binned sketch: the
    STATEFUL aggregation is groupBy(window, bin).count() with a FIXED
    128-bin domain ([0, 1000) in cents — streaming cannot do the
    batch sketch's min/max first pass, so the domain is declared, the
    standard streaming-histogram contract; out-of-domain values clamp
    to the top bin). State is bounded at 128 cells per window — the
    same bounded-state story as stream_hll_windowed_distinct, for
    quantiles. p50/p90 read off the drained bin table batch-side with
    the usual exact-integer ceil-rank; the oracle replays bins, ranks
    and read-off identically."""
    from pyspark.sql import Window

    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    bin_col = F.least(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) * 128 div 100000"),
        F.lit(127).cast("bigint"),
    )
    agg = S.tumbling(
        stream.withColumn("bin", bin_col), "ts", "1 hour", "bin"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    name = f"stream_qb_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    binned = spark.table(name).select(
        F.col("window.start").alias("win_start"), "bin", "cnt"
    )
    mm = binned.groupBy("win_start").agg(F.sum("cnt").alias("n"))
    w = (
        Window.partitionBy("win_start")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).join(mm, "win_start")
    out = None
    for pct in (50, 90):
        hit = (
            cum.filter(F.col("cum") >= F.expr(f"(n * {pct} + 99) div 100"))
            .groupBy("win_start")
            .agg(F.min("bin").alias("bin"))
            .select(
                "win_start",
                F.lit(pct).alias("q_pct"),
                F.expr("(bin + 1) * 100000 div 128").alias("approx_c"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


@query(
    "stream_cdc_merge_snapshot",
    oracle="""
    SELECT user_id,
           -- struct-packed arg_max = ROW semantics: the last change
           -- record's fields, NULLs included. Bare max_by(col, key)
           -- SKIPS null values in DuckDB (returns the latest NON-NULL
           -- type — a different, per-FIELD last-write-wins), while
           -- Spark's max_by returns the value AT the arg-extreme row;
           -- the struct itself is never NULL, so both engines agree
           -- (found by the cross-corpus fuzz: stream_ queries never
           -- met adversarial NULL events in the events-only harness)
           (max_by(struct_pack(t := event_type,
                               v := CAST(floor(value * 100 + 0.5) AS BIGINT)),
                   epoch_us(ts)::HUGEINT * 1000000000000 + event_id)).t
             AS last_type,
           (max_by(struct_pack(t := event_type,
                               v := CAST(floor(value * 100 + 0.5) AS BIGINT)),
                   epoch_us(ts)::HUGEINT * 1000000000000 + event_id)).v
             AS last_value_c,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def stream_cdc_merge_snapshot(spark, sf_dir):
    """Streaming CDC MERGE sink: a foreachBatch loop folds each
    micro-batch into a keyed parquet SNAPSHOT (latest row + running
    count per user) — the Delta/Iceberg `MERGE INTO` streaming-upsert
    pattern built from primitives. Per epoch: the batch pre-aggregates
    to one row per touched key (map-side shrink), then ONE
    merge-shuffle against the previous snapshot; the snapshot is
    written to an epoch-numbered dir and each epoch reads its
    PREDECESSOR, so a replayed epoch (foreachBatch's at-least-once
    contract) rewrites the same output from the same input —
    idempotent, exactly-once end state. maxFilesPerTrigger forces a
    genuinely multi-epoch drain; merge keys use the widened
    timestamp·10^12+event_id slot (events_attribution's collision
    rule). The last-write-wins fold is associative-commutative, so
    batch boundaries cannot change the answer — the batch SQL oracle
    proves it. At scale: snapshot and batch both hash-partition on
    user_id; state lives in files, not the state store — unbounded
    key cardinality without store memory pressure."""
    import shutil

    base = tempfile.mkdtemp(prefix="emma_cdc_snap_")
    ckpt = os.path.join(base, "_ckpt")
    # stage the source into MULTIPLE files: one staged file would make
    # availableNow a single epoch and the merge loop would never merge
    src_dir = os.path.join(base, "src")
    io.read_parquet(spark, f"{sf_dir}/events.parquet").df.repartition(
        8
    ).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = S.read_stream_parquet(spark, src_dir, schema, maxFilesPerTrigger=2)
    okey = F.unix_micros(F.col("ts")).cast("decimal(38,0)") * F.lit(
        1000000000000
    ) + F.col("event_id")

    def latest(df):
        return df.groupBy("user_id").agg(
            F.max_by("event_type", okey).alias("last_type"),
            F.max_by(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"), okey
            ).alias("last_value_c"),
            F.max(okey).alias("okey"),
            F.count(F.lit(1)).alias("n_events"),
        )

    def merge_batch(batch_df, epoch_id: int):
        snap = latest(batch_df)
        prev = os.path.join(base, f"epoch={epoch_id - 1}")
        if epoch_id > 0 and os.path.exists(prev):
            old = batch_df.sparkSession.read.parquet(prev)
            both = old.unionByName(snap)
            snap = both.groupBy("user_id").agg(
                F.max_by("last_type", F.col("okey")).alias("last_type"),
                F.max_by("last_value_c", F.col("okey")).alias("last_value_c"),
                F.max("okey").alias("okey"),
                F.sum("n_events").alias("n_events"),
            )
        snap.write.mode("overwrite").parquet(
            os.path.join(base, f"epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(base)
        if d.startswith("epoch=")
    )
    final = spark.read.parquet(os.path.join(base, f"epoch={epochs[-1]}"))
    out = final.select("user_id", "last_type", "last_value_c", "n_events")
    out = out.localCheckpoint(eager=True)  # detach from the temp dir
    shutil.rmtree(base, ignore_errors=True)
    return out


# NOTE: Spark 4's transformWithStateInPandas (the successor to
# applyInPandasWithState) was evaluated and works API-wise, but its
# state-server protocol requires google.protobuf, which this
# container's python env does not provide (and installs are out of
# scope) — the run crashes with STREAMING_PYTHON_RUNNER_
# INITIALIZATION_FAILURE/ImportError. Arbitrary keyed state stays on
# applyInPandasWithState (stream_keyed_state_counts,
# stream_state_ttl_closed); swap to the new API is mechanical when
# the dependency exists.


@query(
    "stream_session_window_agg",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS t, event_id
      FROM events WHERE user_id < 12
    ),
    marked AS (
      SELECT user_id, t,
             CASE WHEN t >= coalesce(max(t + 1800000000) OVER (
                    PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS ni
      FROM iv
    ),
    grp AS (
      SELECT user_id, t,
             sum(ni) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sess
      FROM marked
    )
    SELECT user_id, min(t) AS start_us, max(t) + 1800000000 AS end_us,
           count(*) AS n_events
    FROM grp GROUP BY user_id, sess
    """,
)
def stream_session_window_agg(spark, sf_dir):
    """session_window as a STREAMING aggregation — the engine-native
    dynamic-gap session merge running in Structured Streaming (the
    batch twin is events_session_window_builtin; SAME oracle modulo
    the user slice, which is the point: the session semantics are
    mode-invariant). Complete-mode drain so every merged session in
    state is emitted; in production a watermark finalizes and evicts
    closed sessions instead (the stream_watermark_append pattern) —
    session state per key merges adjacent windows inside the state
    store, the one streaming aggregation whose state SHRINKS as
    windows merge."""
    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    stream = S.read_stream_parquet(spark, staged, schema).filter(
        F.col("user_id") < 12
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"stream_sw_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_window.start").alias("start_us"),
        F.unix_micros("session_window.end").alias("end_us"),
        "n_events",
    )


@query(
    "stream_sliding_watermark_append",
    oracle="""
    WITH ws AS (
      SELECT event_type, t.w AS win, count(*) AS n
      FROM (
        SELECT event_type,
               epoch_us(ts) // 1000000 AS s,
               ((epoch_us(ts) // 1000000 - 3600) // 1800 + 1) AS w0
        FROM events
        WHERE event_type IS NOT NULL
      ) e,
      unnest([e.w0, e.w0 + 1]) AS t(w)
      WHERE t.w * 1800 <= e.s AND e.s < t.w * 1800 + 3600
      GROUP BY 1, 2
    )
    SELECT event_type, win * 1800 AS win_start_s, n FROM ws
    WHERE (win * 1800 + 3600)::BIGINT * 1000000
          < (SELECT max(epoch_us(ts)) - 2460000000::BIGINT FROM events
             WHERE event_type IS NOT NULL)
    """,
)
def stream_sliding_watermark_append(spark, sf_dir):
    """SLIDING windows + watermark + APPEND — the production config
    for overlapping-window metrics on an unbounded stream (each
    event lives in size/slide windows of state; the watermark
    finalizes and EVICTS each window once event time passes its end
    + delay, emitting it exactly once): 1 h windows sliding every
    30 min, 41-minute delay (deliberately slide-misaligned, the
    stream_watermark_append boundary trick). The availableNow drain
    + no-data batch flushes exactly the windows with
    end < max(ts) − delay — the oracle's HAVING twin over the batch
    explode-to-windows construction (events_sliding_batch_counts),
    closing the loop: batch backfill and streaming emission of the
    SAME sliding metric, one oracle apart."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(
        spark, staged, _staged_schema(spark, staged)
    )
    # out-of-band event times quarantined ahead of the watermark (the
    # far-future side poisons the checkpointed watermark — api.py);
    # event_type is the panel's REQUIRED dimension: a producer
    # dropping/renaming it null-fills silently and every count would
    # collapse into one NULL series, so those rows ride the
    # dead-letter leg (quarantine_required; oracle mirrors IS NOT
    # NULL incl. the watermark subquery — restart-tier DRIFT pass)
    stream, _dead = S.quarantine_out_of_band(stream, "ts", "7 days")
    stream, _null_required = S.quarantine_required(stream, "event_type")
    wm = S.with_watermark(stream, "ts", "41 minutes")
    agg = S.sliding(wm, "ts", "1 hour", "30 minutes", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"stream_slw_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="append", state_partitions=4)
    return spark.table(name).select(
        "event_type",
        F.unix_seconds(F.col("window.start")).alias("win_start_s"),
        "n",
    )


@query(
    "stream_stream_left_outer_join",
    oracle="""
    WITH p AS (SELECT event_id AS pid, user_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS cid, user_id AS c_user, ts AS c_ts
               FROM events WHERE event_type = 'click')
    SELECT p.pid, p.user_id, c.cid
    FROM p LEFT JOIN c
      ON p.user_id = c.c_user
     AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR AND c.c_ts <= p.p_ts
    WHERE c.cid IS NOT NULL
       OR p.p_ts < (SELECT least(
            (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
            (SELECT max(ts) FROM events WHERE event_type = 'click'))
          - INTERVAL 97 MINUTE)
    """,
)
def stream_stream_left_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join — the outer-emission
    semantics the inner variant (stream_stream_interval_join) can't
    show: a purchase with NO click in its preceding hour emits a
    null-extended row, but only once the engine can PROVE no match is
    coming — i.e. when the join watermark passes the purchase's last
    admissible click time (c_ts <= p_ts, so eviction at watermark >
    p_ts). Matched rows emit on arrival; null rows emit from state
    eviction during the availableNow drain's no-data batch. The
    watermark that drives eviction is subtler than max(ts) - delay:
    Catalyst pushes each side's event_type filter BELOW its
    EventTimeWatermark operator, so each watermark node tracks the
    max event time OF ITS OWN SIDE, and the query watermark is their
    MIN (multipleWatermarkPolicy=min, the default) — i.e.
    least(max purchase ts, max click ts) - 97 min (empirically
    verified via StreamingQueryProgress.eventTime per batch). The
    batch oracle encodes exactly that contract: the full left
    interval join, minus unmatched purchases at or above that final
    watermark (97 min is hour-misaligned so the boundary compare
    cannot tie), which are still held in state when the drain stops — the part of the answer an unbounded stream has not yet
    earned the right to emit. State is bounded on both sides by
    watermark + interval, the production requirement for an unbounded
    join."""
    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    p = (
        S.with_watermark(S.read_stream_parquet(spark, staged, schema), "ts", "97 minutes")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts"))
    )
    c = (
        S.with_watermark(S.read_stream_parquet(spark, staged, schema), "ts", "97 minutes")
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("cid"), F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("p_ts - interval 1 hour"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "leftOuter",
    )
    name = f"stream_ssloj_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(j.select("pid", "user_id", "cid"), name,
                    output_mode="append", state_partitions=4)
    return spark.table(name)


@query(
    "stream_chained_window_aggs",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 DAY, h) AS day_start, event_type,
           sum(n)::BIGINT AS n_events, count(*)::BIGINT AS n_hours
    FROM hourly
    GROUP BY 1, 2
    HAVING time_bucket(INTERVAL 1 DAY, h) + INTERVAL 1 DAY
           < (SELECT max(ts) - INTERVAL 37 MINUTE FROM events)
    """,
)
def stream_chained_window_aggs(spark, sf_dir):
    """CHAINED stateful operators in ONE streaming query (Spark
    3.4+'s multiple-stateful-operator support): an hourly
    windowed count per event type feeds a SECOND windowed aggregation
    that rolls the finalized hourly rows up to days — the
    pre-aggregation cascade (hour→day→month) that previously required
    writing the intermediate stream to storage and running a second
    query. Both operators run in append mode off one watermark:
    the hourly window emits when the watermark passes its end, the
    daily window when it passes the DAY end, so the drained result is
    exactly the daily rollup of complete days older than
    max(ts) - 37 min — the oracle's HAVING clause. n_hours counts the
    finalized hourly windows inside each day (24 for interior days —
    the completeness audit). State stays bounded at both levels;
    window(window, ...) consumes the first operator's WINDOW STRUCT
    so the event-time watermark column propagates — passing
    window.start instead drops the watermark tag and append mode is
    rejected (the documented chaining contract)."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(spark, staged, _staged_schema(spark, staged))
    wm = S.with_watermark(stream, "ts", "37 minutes")
    hourly = S.tumbling(wm, "ts", "1 hour", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    daily = (
        hourly.groupBy(
            F.window(F.col("window"), "1 day").alias("dwin"), "event_type"
        )
        .agg(F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_hours"))
    )
    name = f"stream_chain_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(daily, name, output_mode="append", state_partitions=4)
    return spark.table(name).select(
        F.col("dwin.start").alias("day_start"), "event_type",
        "n_events", "n_hours",
    )


@query(
    "pyds_stream_source_counts",
    oracle="""
    WITH r AS (SELECT unnest(range(20000)) AS id),
    s AS (
      SELECT id,
             CAST(concat('0x', substr(md5('synth|' || CAST(id AS VARCHAR)),
                  1, 14)) AS BIGINT) AS h
      FROM r
    )
    SELECT h % 5 AS g, count(*)::BIGINT AS n, sum(h % 10000)::BIGINT AS vc_sum
    FROM s GROUP BY 1
    """,
)
def pyds_stream_source_counts(spark, sf_dir):
    """CUSTOM STREAMING SOURCE (Spark 4 SimpleDataSourceStreamReader,
    sources/pyds.build_stream): a Python-defined stream with
    engine-checkpointed offsets and a deterministic replay contract
    (readBetweenOffsets — the exactly-once recovery path), read
    through readStream and drained into a streaming aggregation. The
    md5-generated content lets the SQL oracle replay the entire
    stream with no files or state involved — the connector, the
    offset bookkeeping, and the streaming agg are all under the
    differential test. Multi-batch offset RESUME across restarts is
    exercised separately in tests/test_streaming.py."""
    from ..sources import pyds

    pyds.register_stream(spark)
    st = (
        spark.readStream.format("emma_synth_stream")
        .option("n", "20000").option("batch", "20000")
        .load()
    )
    agg = st.groupBy((F.col("h") % 5).alias("g")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("vc_sum")
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name)


@query(
    "pyds_stream_sink_roundtrip",
    oracle="""
    WITH r AS (SELECT unnest(range(20000)) AS id),
    s AS (
      SELECT id,
             CAST(concat('0x', substr(md5('synth|' || CAST(id AS VARCHAR)),
                  1, 14)) AS BIGINT) AS h
      FROM r
    )
    SELECT h % 4 AS g, count(*)::BIGINT AS n, sum(h % 10000)::BIGINT AS vc_sum,
           min(id)::BIGINT AS min_id, max(id)::BIGINT AS max_id
    FROM s GROUP BY 1
    """,
)
def pyds_stream_sink_roundtrip(spark, sf_dir):
    """CUSTOM STREAMING SINK roundtrip (sources/pyds.build_sink):
    the deterministic Python stream source drains through a
    Python-defined DataSourceStreamWriter — per-task staged files,
    driver-side two-phase commit with a batch manifest, abort
    cleanup — then the committed files are read back and aggregated;
    hash-matching the generator-replay oracle proves the sink's
    commit protocol lost and duplicated NOTHING. Completes the
    Python connector matrix: batch read (with pushdown), stream read
    (checkpointed offsets), stream write (staged commit)."""
    import tempfile

    from ..sources import pyds

    pyds.register_stream(spark)
    pyds.register_sink(spark)
    out = tempfile.mkdtemp(prefix="emma_pyds_sink_")
    st = (
        spark.readStream.format("emma_synth_stream")
        .option("n", "20000").option("batch", "20000")
        .load()
    )
    q = (
        st.writeStream.format("emma_synth_sink")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="emma_pyds_ck_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.csv(out, schema="id bigint, h bigint, vc bigint")
    return back.groupBy((F.col("h") % 4).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("vc_sum"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


@query(
    "stream_two_source_union",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n,
           sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))::BIGINT AS total_q
    FROM events GROUP BY event_type
    """,
)
def stream_two_source_union(spark, sf_dir):
    """MULTI-SOURCE streaming topology: the events table split across
    TWO directories (even/odd event ids — standing in for the
    history-shard + live-shard layout of a backfill-then-tail
    deployment), each read as its own file-source stream, UNIONED
    into one streaming DataFrame and aggregated — the drained result
    must equal the batch aggregate over everything, proving no rows
    are lost or double-counted at the union seam. Each source keeps
    its own offset log in the shared checkpoint; the union is a plan
    operator, not a storage merge. This is the lambda-architecture
    collapse Structured Streaming enables: history and tail run
    through ONE query instead of two systems."""
    import os
    import tempfile

    src = f"{sf_dir}/events.parquet"
    stamp = f"{os.path.getmtime(src):.0f}_{os.path.getsize(src)}_split"
    base = os.path.join(
        tempfile.gettempdir(), f"emma_split_{abs(hash((sf_dir, stamp)))}"
    )
    ev = io.read_parquet(spark, src).df
    if not (os.path.exists(os.path.join(base, "even", "_SUCCESS"))
            and os.path.exists(os.path.join(base, "odd", "_SUCCESS"))):
        ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
            os.path.join(base, "even"))
        ev.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(
            os.path.join(base, "odd"))
    schema = ev.schema
    s1 = S.read_stream_parquet(spark, os.path.join(base, "even"), schema)
    s2 = S.read_stream_parquet(spark, os.path.join(base, "odd"), schema)
    u = s1.unionByName(s2)
    agg = u.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
          .alias("total_q"),
    )
    name = f"stream_union_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name)


@query(
    "stream_windowed_topk_users",
    oracle="""
    WITH wc AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, user_id,
             count(*) AS n
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY 1, 2
      HAVING win_start + INTERVAL 1 HOUR
               < (SELECT max(ts) - INTERVAL 37 MINUTE FROM events
                  WHERE user_id IS NOT NULL)
    ),
    ranked AS (
      -- user_id is a REQUIRED column since r12 (quarantine_required
      -- drift guard): the anonymous NULL bucket rides the
      -- dead-letter leg, mirrored by the IS NOT NULL above — which
      -- also retires the r10 NULLS LAST tie-break pin (no NULL can
      -- reach the ranking on either engine)
      SELECT win_start, user_id, n,
             row_number() OVER (PARTITION BY win_start
               ORDER BY n DESC, user_id) AS rank
      FROM wc
    )
    SELECT win_start, user_id, n, rank FROM ranked WHERE rank <= 3
    """,
)
def stream_windowed_topk_users(spark, sf_dir):
    """Windowed TOP-K heavy hitters on a stream — the trending-items /
    noisiest-users panel: per-hour per-user counts as a watermarked
    APPEND streaming aggregation (state bounded, each window emitted
    once when finalized — the stream_watermark_append eviction
    contract), then the top-3 ranking runs BATCH-side over the sink
    table (window functions don't exist inside a streaming agg; the
    production shape is exactly this split — stream maintains the
    windowed counts, the serving layer ranks finalized windows, e.g.
    in foreachBatch or the downstream reader). The ranking window is
    PARTITIONED by win_start — per-window work, never global. The
    oracle replays windowing + watermark + ranking in one SQL text.

    user_id is the panel's REQUIRED dimension since r12
    (quarantine_required drift guard): a producer dropping/renaming
    the column null-fills silently and the whole panel would collapse
    into one NULL heavy hitter, so NULL-user rows ride the
    dead-letter leg (the r10 "anonymous bucket ranks too" contract
    moved there deliberately — the oracle mirrors with IS NOT NULL,
    incl. the watermark subquery, retiring its NULLS LAST pin)."""
    staged = _stage_events(spark, sf_dir)
    stream = S.read_stream_parquet(
        spark, staged, _staged_schema(spark, staged)
    )
    # out-of-band event times quarantined ahead of the watermark (the
    # far-future side poisons the checkpointed watermark — api.py)
    stream, _dead = S.quarantine_out_of_band(stream, "ts", "7 days")
    stream, _null_required = S.quarantine_required(stream, "user_id")
    wm = S.with_watermark(stream, "ts", "37 minutes")
    agg = S.tumbling(wm, "ts", "1 hour", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="append", state_partitions=4)
    from pyspark.sql import Window

    # plain asc tie-break: quarantine_required("user_id") means no
    # NULL can reach the ranking (the r10 nulls-last pin is retired)
    w = Window.partitionBy("win_start").orderBy(F.desc("n"), F.col("user_id"))
    return (
        spark.table(name)
        .select(F.col("window.start").alias("win_start"), "user_id", "n")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


@query(
    "stream_scd2_temporal_enrich",
    oracle="""
    WITH users AS (
      -- a NULL user_id has no SCD2 history (dim keys are PK-like);
      -- the = join below drops anonymous events identically on both
      -- engines, and without this WHERE the md5-tier hash of NULL
      -- crashes DuckDB one-sidedly via NULL-ignoring concat ->
      -- CAST('0x') (r10 NULL-user_id cross fuzz)
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ),
    dim AS (
      SELECT user_id, k.k AS k,
             CASE WHEN k.k = 0 THEN TIMESTAMP '2024-01-01'
                  ELSE TIMESTAMP '2024-01-01' + to_days(CAST(k.k * 10
                    + CAST(concat('0x', substr(md5('tier' || '|'
                        || CAST(user_id AS VARCHAR) || '|'
                        || CAST(k.k AS VARCHAR)), 1, 14)) AS BIGINT) % 5
                    AS INT)) END AS valid_from,
             CAST(concat('0x', substr(md5('plan' || '|'
                 || CAST(user_id AS VARCHAR) || '|'
                 || CAST(k.k AS VARCHAR)), 1, 14)) AS BIGINT) % 7 AS plan_id
      FROM users, (SELECT unnest([0, 1, 2, 3]) AS k) k
    ),
    dim2 AS (
      SELECT user_id, plan_id, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY k)
               AS valid_to
      FROM dim
    ),
    j AS (
      SELECT e.ts, d.plan_id, e.value
      FROM events e JOIN dim2 d
        ON e.user_id = d.user_id
       AND e.ts >= d.valid_from
       AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    )
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, plan_id,
           count(*) AS n,
           sum(floor(value * 10000 + 0.5)) / 10000 AS total
    FROM j GROUP BY 1, 2
    """,
)
def stream_scd2_temporal_enrich(spark, sf_dir):
    """Stream enriched against a TEMPORAL (SCD2) dimension — the
    composition stream_static_enrich (latest-value lookup) cannot
    express: each event resolves the dimension row whose validity
    interval CONTAINS its event time, so late-arriving events get the
    plan that was in force THEN, not the current one (the
    events_feature_store_pit leakage rule applied to streaming ETL).
    The dimension is a deterministic 4-interval plan history per user
    (md5-jittered boundaries, lead() closes intervals — the
    scd2_status_history build); the stream-static join is equi on
    user_id with the interval predicate as a residual filter (hash
    join per micro-batch, broadcast dim, NO stream shuffle before the
    windowed agg). Daily counts per plan; oracle replays dim build +
    interval join + windowing in batch SQL."""
    staged = _stage_events(spark, sf_dir)
    schema = _staged_schema(spark, staged)
    stream = S.read_stream_parquet(spark, staged, schema)

    users = (
        spark.read.parquet(staged)
        .filter(F.col("user_id").isNotNull())  # no SCD2 history for NULL
        .select("user_id").distinct()
    )
    ks = spark.range(4).select(F.col("id").cast("int").alias("k"))
    h = lambda salt: F.expr(
        f"CAST(conv(substring(md5(concat('{salt}', '|',"
        " CAST(user_id AS STRING), '|', CAST(k AS STRING))), 1, 14),"
        " 16, 10) AS BIGINT)"
    )
    dim = users.crossJoin(F.broadcast(ks)).select(
        "user_id", "k",
        F.when(
            F.col("k") == 0, F.lit("2024-01-01").cast("timestamp")
        ).otherwise(
            F.expr(
                "CAST('2024-01-01' AS TIMESTAMP)"
                " + make_interval(0, 0, 0, CAST(k * 10 AS INT)"
                " + CAST(CAST(conv(substring(md5(concat('tier', '|',"
                " CAST(user_id AS STRING), '|', CAST(k AS STRING))),"
                " 1, 14), 16, 10) AS BIGINT) % 5 AS INT), 0, 0, 0)"
            )
        ).alias("valid_from"),
        (h("plan") % 7).alias("plan_id"),
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("user_id").orderBy("k")
    dim2 = dim.select(
        "user_id", "plan_id", "valid_from",
        F.lead("valid_from").over(wd).alias("valid_to"),
    )
    joined = stream.join(
        F.broadcast(dim2),
        (stream["user_id"] == dim2["user_id"])
        & (stream["ts"] >= dim2["valid_from"])
        & (dim2["valid_to"].isNull() | (stream["ts"] < dim2["valid_to"])),
    ).select(stream["ts"], dim2["plan_id"], stream["value"])
    agg = S.tumbling(joined, "ts", "1 day", "plan_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))) / 10000).alias(
            "total"
        ),
    )
    name = f"stream_scd2_{uuid.uuid4().hex[:8]}"
    S.run_to_memory(agg, name, output_mode="complete", state_partitions=4)
    return spark.table(name).select(
        F.col("window.start").alias("day"), "plan_id", "n", "total"
    )
