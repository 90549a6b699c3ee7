"""EPOCH-STRADDLE differential — the pre-1970 timestamp tier.

The whole events corpus is shifted by ONE fixed offset so it lands on
[~1969-12-17, ~1970-01-15): every timestamp's epoch is negative,
zero-adjacent, or small-positive, while the corpus KEEPS its original
~30-day span (so day-span domain contracts — e.g. the Viterbi 31-bit
mask slot — still hold; this tier probes epoch arithmetic, not domain
violations). Orders shift by a whole number of days (midnight-date
canonicalization preserved) to straddle 1970 the same way.

What it isolates: every `unix_micros(ts) div N` / `epoch_us(ts) // N`
pair, day-bucketing via date_trunc, gap/session interval arithmetic,
and calendar extraction (year/month/dow) evaluated on NEGATIVE
epochs — the sign regime where truncate-toward-zero vs floor-toward
-inf conventions diverge (the repo's exactness rules claim div and //
agree including negatives; this corpus is the empirical check). Year-
hardcoded filters (1996/1997) now match nothing, so the tier also
re-runs the empty-intermediate contracts on a second corpus shape.

    python tools/fuzzcheck_epoch.py [query ...]

Default sweeps every events/orders-backed oracle.
"""
import datetime as dt
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_epoch"
SRC = "/root/testdata/sf0.001"

# events corpus starts 2024-01-01; put day 16 of its span on the epoch
_EV_ANCHOR = dt.datetime(2024, 1, 16)
_EV_OFFSET_US = int((_EV_ANCHOR - dt.datetime(1970, 1, 1)).total_seconds()) * 10**6
# orders span ~1995-2002; -29 years of whole days straddles 1970
_ORD_OFFSET_US = 10_592 * 86_400 * 10**6


def _shift(tab: pa.Table, col: str, offset_us: int) -> pa.Table:
    i = tab.schema.get_field_index(col)
    field = tab.schema.field(i)
    as_int = tab.column(col).cast(pa.int64())
    shifted = pc.subtract(as_int, pa.scalar(offset_us, pa.int64()))
    return tab.set_column(i, field, shifted.cast(field.type))


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        if t == "events":
            tab = _shift(tab, "ts", _EV_OFFSET_US)
        elif t == "orders":
            tab = _shift(tab, "o_orderdate", _ORD_OFFSET_US)
        pq.write_table(tab, f"{path}/{t}.parquet")
    return path


def connect(path: str = FUZZ_DIR):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{path}/{t}.parquet')"
        )
    return con


def main(argv) -> int:
    from emma_spark.session import get_spark

    only = set(a for a in argv if not a.startswith("--")) or None
    build_corpus()
    spark = get_spark("fuzzepoch")
    spark.sparkContext.setLogLevel("ERROR")
    # stream_* is excluded by DOMAIN CONTRACT, not convenience: Spark
    # Structured Streaming's event-time watermark is floored at epoch 0
    # internally (probed: every pre-1970 window is silently dropped as
    # late — surviving windows start exactly at 1970-01-01T00:00), so
    # watermarked operators cannot represent pre-epoch event times on
    # ANY corpus. Documented in streaming/api.py and docs/SCALE.md.
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only,
        exclude_prefixes=("stream_",),
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
