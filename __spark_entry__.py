"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``emma_spark.workloads`` (one module per SURVEY §2
area); this file only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 5-way join revenue
    rollup (TPC-H Q5 shape — SURVEY §2.3 multi-way joins)."""
    from emma_spark.workloads import load_all

    return load_all()["join_multiway_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from emma_spark.workloads import load_all

    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for approximate /
    non-SQL-expressible ops → driver runs rows-only check)."""
    from emma_spark.workloads import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
