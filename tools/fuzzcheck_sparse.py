"""SPARSE-WAREHOUSE differential — the empty-intermediate tier.

Every table is cut to a 3-row slice of the real sf0.001 data (dims
kept whole): most selective filters now match NOTHING, so every
raise-on-empty asymmetry between the engines fires — `element_at` /
`min()` seeds over empty arrays (ANSI INVALID_ARRAY_INDEX where a
recursive-CTE oracle just emits no rows — the events_alert_debounce
class), NULL-vs-0 empty-sum seams, single-row window frames, empty
broadcast sides. Until r9 these surfaced as silent SKIPs
('engine-error'); with the one-sided statuses every Spark-only or
DuckDB-only crash is a differential FAIL.

Both-sides errors remain SKIPs — a bag contract that raises on empty
input on BOTH engines (fold min/max parity with the reference) is
corpus-shape, not divergence.

    python tools/fuzzcheck_sparse.py [--all] [query ...]

Default sweeps every table-backed oracle (this tier exists to be run
wide — the whole point is queries nobody suspected).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from tools.fuzzcore import ALL_TABLES, run_fuzz  # noqa: E402

FUZZ_DIR = "/tmp/emma_fuzz_sparse"
SRC = "/root/testdata/sf0.001"

# dims stay whole — an empty dimension is ingest breakage, not a
# query-semantics shape; facts shrink to 3 rows
DIMS = {"region", "nation"}
N_FACT = 3


def build_corpus(path: str = FUZZ_DIR, src: str = SRC):
    os.makedirs(path, exist_ok=True)
    for t in ALL_TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        if t not in DIMS:
            tab = tab.slice(0, N_FACT)
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
    spark = get_spark("fuzzsparse")
    spark.sparkContext.setLogLevel("ERROR")
    n_ok, n_skip, failures = run_fuzz(
        spark, connect(), FUZZ_DIR, set(ALL_TABLES), only=only
    )
    print(f"\n{n_ok} ok, {n_skip} skipped, {len(failures)} FAIL")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
