"""The sanctioned Python-UDF escape hatch: Arrow-vectorized only.

Engine policy (SURVEY §4 #10, mirroring emma's native-ops
specialization): lambdas become Column expressions; Python runs only
at Arrow-batched seams. When a scalar function genuinely cannot be
expressed as Columns, THIS is the allowed form — ``pandas_udf``
(Arrow batch transfer, ~10-100× faster than row-at-a-time
``F.udf``, which this engine never uses; the plan shows
ArrowEvalPython, never BatchEvalPython).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def arrow_udf(return_type: str) -> Callable:
    """Decorator: a pandas Series -> Series function becomes a Column
    function. Use only when the logic is not expressible with
    ``pyspark.sql.functions`` — and say why in the docstring of the
    decorated function."""

    def deco(fn: Callable) -> Callable[..., Column]:
        return F.pandas_udf(fn, returnType=return_type)

    return deco
