"""Workload registry: every SURVEY §2 operator declared as a runnable
query over the driver's TPC-H-ish tables, paired with a DuckDB oracle.

This is the rebuild of the reference's differential test strategy
(``BaseCodegenIntegrationSpec`` — every program executed on the backend
and compared with an un-optimized reference run; SURVEY §5 layer 2):
here the oracle is ANSI SQL on the same parquet, run by the driver
harness at sf0.01.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def rd(col, dp: int):
    """Cross-engine-stable rounding: floor(x*10^dp + 0.5)/10^dp.

    Unlike ``round()`` (whose half-way/ULP behavior differs between
    engines), every step here is a deterministic IEEE op — identical
    inputs give identical doubles in Spark and DuckDB."""
    from pyspark.sql import functions as F

    s = 10 ** dp
    return F.floor(col * s + F.lit(0.5)) / F.lit(s)


def rd_sql(expr: str, dp: int) -> str:
    s = 10 ** dp
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def qsum(col, dp: int = 4):
    """Order-independent double sum: quantize per row to 10^-dp units
    (exact integers), sum exactly, rescale. Immune to the summation-
    order nondeterminism of float aggregation across engines AND across
    Spark partitionings. Exact while |Σ| < 2^52 / 10^dp."""
    from pyspark.sql import functions as F

    s = 10 ** dp
    return F.sum(F.floor(col * s + F.lit(0.5))) / F.lit(s)


def qsum_sql(expr: str, dp: int = 4) -> str:
    s = 10 ** dp
    return f"sum(floor(({expr}) * {s} + 0.5)) / {s}"

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # include in bench.py


def query(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, headline)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all workload modules (side effect: registration)."""
    from . import (  # noqa: F401
        dedup, graph, ml, multimodal, relational, similarity, streaming, text,
    )

    return REGISTRY
