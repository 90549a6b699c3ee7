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
