"""Element-expression layer: lambdas over row proxies -> Spark Columns.

Reference analog: ``SparkExp`` — emma's mini expression IR whose nodes
each evaluate to a Spark ``Column``
(``emma-spark/src/main/scala/org/emmalanguage/api/spark/SparkExp.scala:29-120``).
Emma *recognizes* a whitelist (projection, struct construction, literals,
null tests, null-safe equality, ordering, boolean ops, arithmetic,
startsWith/contains) and falls back to opaque JVM lambdas for the rest
(``SparkSpecializeOps.scala:133-303``).

Our design is strictly wider and simpler: the user lambda receives an
:class:`Elem` proxy whose attribute accesses ARE Columns, so every
``pyspark.sql.functions`` builtin composes naturally — the whole
expression stays JVM-side in whole-stage codegen. There is no fallback
to row-at-a-time Python in this layer by construction.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Elem:
    """Row proxy: ``x.field`` yields the bound DataFrame's Column.

    Mirrors ``SparkExp.Root``/``Proj`` (``SparkExp.scala:34-36,59-75``):
    nested access chains (``x.name.first``) compose via Column
    ``getField``. Single-column value bags expose the element itself as
    ``x.value`` (convention: scalar bags have one column named
    ``value``).
    """

    __slots__ = ("_df", "_alias")

    def __init__(self, df: DataFrame, alias: str | None = None):
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_alias", alias)

    def __getattr__(self, name: str) -> Column:
        if name.startswith("__"):
            raise AttributeError(name)
        if self._alias is not None:
            return F.col(f"{self._alias}.{name}")
        return self._df[name]

    def __getitem__(self, name: str) -> Column:
        return self.__getattr__(name)

    def columns(self) -> list[str]:
        return list(self._df.columns)

    def all(self) -> list[Column]:
        return [self.__getattr__(c) for c in self._df.columns]


def struct(**fields: Column | Any) -> Column:
    """Case-class / named-tuple construction (``SparkExp.Struct``,
    ``SparkExp.scala:76-79``)."""
    return F.struct(*[F.lit(v).alias(k) if not isinstance(v, Column) else v.alias(k) for k, v in fields.items()])


def eq(a: Column | Any, b: Column | Any) -> Column:
    """Null-safe equality — emma compiles ``==`` to ``eqNullSafe``
    (``SparkExp.scala:87-90``)."""
    a = a if isinstance(a, Column) else F.lit(a)
    return a.eqNullSafe(b)


def ne(a: Column | Any, b: Column | Any) -> Column:
    """Null-safe inequality (``SparkExp.scala:89-90``)."""
    return ~eq(a, b)


ExprFn = Callable[[Elem], Any]


def compile_projection(df: DataFrame, f: ExprFn, default_name: str = "value") -> list[Column]:
    """Lower a map/projection lambda to select-list Columns.

    Result shapes accepted:
      - a single ``Column``        -> one column aliased ``default_name``
      - a ``Mapping[str, Column]`` -> named projection (case-class analog)
      - an :class:`Elem`           -> identity projection
    """
    out = f(Elem(df))
    return normalize_projection(out, default_name)


def normalize_projection(out: Any, default_name: str = "value") -> list[Column]:
    if isinstance(out, Elem):
        return out.all()
    if isinstance(out, Mapping):
        return [
            (v if isinstance(v, Column) else F.lit(v)).alias(k) for k, v in out.items()
        ]
    if isinstance(out, (list, tuple)):
        cols = []
        for i, v in enumerate(out):
            col = v if isinstance(v, Column) else F.lit(v)
            cols.append(col.alias(f"_{i + 1}"))  # tuple -> _1/_2 struct fields (SURVEY §1.2)
        return cols
    if not isinstance(out, Column):
        out = F.lit(out)
    return [out.alias(default_name)]


def compile_predicate(df: DataFrame, p: ExprFn) -> Column:
    """Lower a filter lambda to a boolean Column (``SparkExp``'s
    boolean/comparison nodes, ``SparkExp.scala:83-104``)."""
    out = p(Elem(df))
    if not isinstance(out, Column):
        raise TypeError(f"predicate must produce a Column, got {type(out)}")
    return out
