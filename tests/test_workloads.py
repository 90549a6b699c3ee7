"""Differential check of EVERY registered workload against its DuckDB
oracle — the same comparison the driver harness runs at sf0.01
(CORRECTNESS gate), run here at the test scale factor."""

from __future__ import annotations

import pytest

from emma_spark.workloads import load_all
from tests.conftest import SF_DIR, assert_bag_equal

REGISTRY = load_all()
ORACLE_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_CASES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_bag_equal(df, duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_query_runs(name, spark):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_bitmap_dau_equals_count_distinct(spark):
    """events_bitmap_dau's popcount-of-OR must equal the direct
    count(distinct user_id) per day — an independent in-engine
    cross-check of the bitmap encoding (the oracle only proves both
    engines agree on the SAME encoding)."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["events_bitmap_dau"].fn(spark, SF_DIR)
    e = eio.read_parquet(spark, f"{SF_DIR}/events.parquet").df
    direct = e.groupBy(
        F.expr("CAST(CAST(date_trunc('day', ts) AS LONG) div 86400 AS BIGINT)")
          .alias("day")
    ).agg(F.countDistinct("user_id").alias("dau"))
    got = {r["day"]: r["dau"] for r in df.collect()}
    want = {r["day"]: r["dau"] for r in direct.collect()}
    assert got == want


def test_ses_fold_matches_python_recursion(spark):
    """orders_ses_level_fold's array fold must equal the literal
    sequential recursion run in Python over the same monthly series."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["orders_ses_level_fold"].fn(spark, SF_DIR)
    got = {r["o_orderpriority"]: r["ses_level_c"] for r in df.collect()}
    o = eio.read_parquet(spark, f"{SF_DIR}/orders.parquet").df
    m = (
        o.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("mo"),
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("bigint")).alias("rev_c"))
        .collect()
    )
    series: dict = {}
    for r in m:
        series.setdefault(r["o_orderpriority"], []).append((r["mo"], r["rev_c"]))
    for pri, xs in series.items():
        vals = [v for _, v in sorted(xs)]
        s = vals[0]
        for x in vals[1:]:
            s = (3 * x + 7 * s) // 10
        assert got[pri] == s, pri


def test_rolling_wau_bitmap_equals_direct_distinct(spark):
    """Trailing-7-day bitmap WAU must equal the direct (quadratic)
    per-day count(distinct) over the trailing window."""
    from pyspark.sql import functions as F

    from emma_spark.sources import io as eio

    df = REGISTRY["events_rolling_wau_bitmap"].fn(spark, SF_DIR)
    got = {r["day"]: r["wau"] for r in df.collect()}
    e = eio.read_parquet(spark, f"{SF_DIR}/events.parquet").df.select(
        F.expr("CAST(CAST(date_trunc('day', ts) AS LONG) div 86400 AS BIGINT)")
          .alias("day"),
        "user_id",
    ).collect()
    by_day: dict = {}
    for r in e:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    lo, hi = min(by_day), max(by_day)
    for d in range(lo, hi + 1):
        users = set()
        for k in range(max(lo, d - 6), d + 1):
            users |= by_day.get(k, set())
        assert got[d] == len(users), d


def test_quantized_constants_are_correctly_rounded():
    """The ppm literals shared by both engines (the only sanctioned
    way to use transcendental constants cross-engine) must be the
    correctly-rounded quantizations of their definitions: Benford
    log10(1+1/d) and the Poisson(1) CDF."""
    import math

    from emma_spark.workloads.ml import _POIS_PPM

    ben = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
           6: 66947, 7: 57992, 8: 51153, 9: 45757}
    for d, ppm in ben.items():
        assert round(math.log10(1 + 1 / d) * 1e6) == ppm, d
    cum = 0.0
    for k, t in enumerate(_POIS_PPM):
        cum += math.exp(-1) / math.factorial(k)
        assert round(cum * 1e6) == t, k


def test_fiscal_445_mapping_matches_reference_calendar():
    """The integer 4-4-5 arithmetic must agree with an explicit
    Python enumeration of the fiscal calendar."""
    def fiscal(days_since_epoch):
        wk = days_since_epoch // 7
        fq = wk // 13
        w = wk % 13
        pip = 0 if w < 4 else (1 if w < 8 else 2)
        return fq // 4, (fq % 4) * 3 + pip

    # reference: enumerate weeks with the 4/4/5 pattern explicitly
    pattern = [0] * 4 + [1] * 4 + [2] * 5  # weeks -> period-in-quarter
    for day in range(0, 7 * 52 * 3, 3):
        wk = day // 7
        year, period = fiscal(day)
        assert year == wk // 52
        q_in_year = (wk % 52) // 13
        assert period == q_in_year * 3 + pattern[wk % 13]


def test_amortization_fold_matches_python_walk(spark):
    """orders_loan_amortization's packed fold == a plain python
    schedule walk on the same loans."""
    import duckdb

    from emma_spark.workloads import load_all

    reg = load_all()
    got = {
        r.o_orderkey: (r.months_to_payoff, r.total_interest_c, r.residual_c)
        for r in reg["orders_loan_amortization"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    rows = duckdb.sql(
        "SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        " FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
        " WHERE o_orderkey % 307 = 0"
    ).fetchall()
    want = {}
    for k, pc in rows:
        pmt = pc * 46 // 1000
        bal, interest, months = pc, 0, 0
        for _ in range(60):
            if bal == 0:
                break
            i = bal // 100
            interest += i
            months += 1
            bal = max(bal + i - pmt, 0)
        want[k] = (months, interest, bal)
    assert got == want


def test_token_bucket_fold_matches_python_walk(spark):
    """events_token_bucket_sim's packed fold == a plain python
    token-bucket replay on the same per-user timestamp sequences."""
    import duckdb

    from emma_spark.workloads import load_all

    reg = load_all()
    got = {
        r.user_id: (r.n_events, r.n_rejected, r.tokens_left)
        for r in reg["events_token_bucket_sim"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    rows = duckdb.sql(
        "SELECT user_id, epoch_us(ts) // 1000000 AS s"
        " FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
        " WHERE user_id % 17 = 0 ORDER BY user_id, s"
    ).fetchall()
    from collections import defaultdict

    seqs = defaultdict(list)
    for u, s in rows:
        seqs[u].append(s)
    want = {}
    for u, ts in seqs.items():
        tokens, rejected, prev = 4, 0, ts[0]  # first event consumed
        for x in ts[1:]:
            tokens = min(tokens + (x - prev) // 600, 5)
            if tokens >= 1:
                tokens -= 1
            else:
                rejected += 1
            prev = x
        want[u] = (len(ts), rejected, tokens)
    assert got == want
