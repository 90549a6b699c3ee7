"""Comprehension layer: multi-generator queries with guards, lowered
to join/cross/filter DataFrame plans by GUARD ANALYSIS — the engine's
rebuild of emma's single most important query-semantics feature.

Reference: emma has NO join in the user API; joins are *derived* from
for-comprehensions with equality guards by the rule cascade in
``compiler/lang/comprehension/Combination.scala`` (828 LoC):
``MatchFilter`` (:125-145) pulls guards to their earliest generator,
``MatchSplitGuard`` (:533) splits conjunctions,
``MatchCollectEqualityGuards`` (:598-658) fuses composite keys,
``MatchEquiJoin`` (:723-777) / ``MatchCross`` (:340-367) emit the
combinators.

Rebuild: guards are lambdas over a namespace of generator proxies;
proxies build *tracked* expressions (a Column plus the set of
generators it references). The lowering walks generators in order,
joining each new generator on every equality conjunct that links it
to the already-joined prefix (composite keys = multiple conjuncts),
falling back to crossJoin; non-equality guards become filters at the
earliest point all their generators are in scope. Catalyst then
reorders/pushes further — we derive, it optimizes (SURVEY §4 #3/#4).

Example (triangle enumeration, ``EnumerateTriangles.scala:28-40``)::

    tri = (comprehension(a=edges, b=edges, c=edges)
           .where(lambda x: x.a.dst == x.b.src)
           .where(lambda x: x.a.src == x.c.src)
           .where(lambda x: x.b.dst == x.c.dst)
           .select(lambda x: {"x": x.a.src, "y": x.a.dst, "z": x.b.dst}))
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class TExpr:
    """A Column plus the set of generator names it references."""

    __slots__ = ("col", "gens")

    def __init__(self, col: Column, gens: frozenset):
        self.col = col
        self.gens = gens

    # -- equality: the join-derivation hook ---------------------------
    def __eq__(self, other):  # noqa: D105
        o = _as_texpr(other)
        return TEq(self, o)

    def __ne__(self, other):
        o = _as_texpr(other)
        return TExpr(~self.col.eqNullSafe(o.col), self.gens | o.gens)

    # -- everything else stays opaque (predicate/projection material) -
    def _bin(self, other, op) -> "TExpr":
        o = _as_texpr(other)
        return TExpr(op(self.col, o.col), self.gens | o.gens)

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._bin(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._bin(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __mod__(self, o):
        return self._bin(o, lambda a, b: a % b)

    def __lt__(self, o):
        return self._bin(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._bin(o, lambda a, b: a <= b)

    def __gt__(self, o):
        return self._bin(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._bin(o, lambda a, b: a >= b)

    def __and__(self, o):
        return TConj(_conjuncts(self) + _conjuncts(o))

    def __or__(self, o):
        oo = _as_texpr(o) if not isinstance(o, (TEq, TConj)) else _merge_pred(o)
        return TExpr(self.col | oo.col, self.gens | oo.gens)

    def __invert__(self):
        return TExpr(~self.col, self.gens)

    def __getattr__(self, name: str):
        """Delegate Column methods (contains, startswith, isin, cast…),
        re-wrapping results and unioning generator sets of arguments."""
        meth = getattr(self.col, name)

        def call(*args, **kw):
            gens = self.gens
            uargs = []
            for a in args:
                if isinstance(a, TExpr):
                    gens = gens | a.gens
                    uargs.append(a.col)
                else:
                    uargs.append(a)
            out = meth(*uargs, **kw)
            return TExpr(out, gens) if isinstance(out, Column) else out

        return call


class TEq:
    """Top-level equality guard — the join-key candidate."""

    def __init__(self, left: TExpr, right: TExpr):
        self.left = left
        self.right = right
        self.gens = left.gens | right.gens

    def __and__(self, o):
        return TConj(_conjuncts(self) + _conjuncts(o))

    def __or__(self, o):
        return _merge_pred(self) | o

    def __invert__(self):
        return ~_merge_pred(self)

    def column(self) -> Column:
        return self.left.col.eqNullSafe(self.right.col)


class TConj:
    """Conjunction of guards (MatchSplitGuard — kept split)."""

    def __init__(self, parts: list):
        self.parts = parts
        self.gens = frozenset().union(*[p.gens for p in parts])


def _as_texpr(v) -> TExpr:
    if isinstance(v, TExpr):
        return v
    if isinstance(v, TEq):
        return _merge_pred(v)
    return TExpr(v if isinstance(v, Column) else F.lit(v), frozenset())


def _merge_pred(p) -> TExpr:
    if isinstance(p, TEq):
        return TExpr(p.column(), p.gens)
    if isinstance(p, TConj):
        cols = [_merge_pred(x).col if not isinstance(x, TExpr) else x.col for x in p.parts]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return TExpr(out, p.gens)
    return p


def _conjuncts(p) -> list:
    if isinstance(p, TConj):
        return list(p.parts)
    return [p]


class _Namespace:
    """The lambda argument: ``x.<gen>.<field>`` -> tracked Column in
    the generator's alias scope."""

    def __init__(self, gens: dict[str, DataFrame]):
        self._gens = gens

    def __getattr__(self, gen: str):
        if gen.startswith("_"):
            raise AttributeError(gen)
        df = self._gens[gen]
        return _GenProxy(gen, df)

    __getitem__ = __getattr__


class _GenProxy:
    def __init__(self, gen: str, df: DataFrame):
        self._gen = gen
        self._df = df

    def __getattr__(self, field: str):
        if field.startswith("_"):
            raise AttributeError(field)
        return TExpr(F.col(f"{self._gen}.{field}"), frozenset({self._gen}))

    __getitem__ = __getattr__


class Comprehension:
    """Builder: generators (+ order) > guards > head."""

    def __init__(self, **gens: Any):
        from ..core import DataBag

        self._gens: dict[str, DataFrame] = {
            k: (v.df if isinstance(v, DataBag) else v) for k, v in gens.items()
        }
        self._guards: list = []

    def where(self, guard: Callable) -> "Comprehension":
        ns = _Namespace(self._gens)
        out = guard(ns)
        if isinstance(out, Column):  # untracked plain Column: opaque, all gens
            out = TExpr(out, frozenset(self._gens))
        self._guards.extend(_conjuncts(out))
        return self

    def _lower(self) -> DataFrame:
        """The Combination.scala cascade, in 30 lines."""
        order = list(self._gens)
        remaining = list(self._guards)
        joined: set[str] = {order[0]}
        plan = self._gens[order[0]].alias(order[0])

        def take_applicable(scope: set[str]):
            nonlocal remaining
            # identity comparisons throughout: TExpr.__eq__ builds join
            # guards, so `in`-membership would misfire on truthy TEq
            app = [g for g in remaining if g.gens <= scope]
            remaining = [g for g in remaining if all(g is not a for a in app)]
            return app

        # guards on the first generator alone -> pre-filters
        for g in take_applicable(joined):
            plan = plan.filter(_merge_pred(g).col)

        for gen in order[1:]:
            nxt = self._gens[gen].alias(gen)
            scope = joined | {gen}
            app = take_applicable(scope)
            # equality conjuncts linking prefix <-> new gen become the
            # join condition (composite keys = several conjuncts);
            # everything else in scope becomes a post-join filter
            keys = [
                g
                for g in app
                if isinstance(g, TEq)
                and (
                    (g.left.gens <= joined and g.right.gens == {gen})
                    or (g.right.gens <= joined and g.left.gens == {gen})
                )
            ]
            rest = [g for g in app if all(g is not k for k in keys)]
            if keys:
                cond = keys[0].column()
                for kgd in keys[1:]:
                    cond = cond & kgd.column()
                plan = plan.join(nxt, cond, "inner")
            else:
                plan = plan.crossJoin(nxt)
            for g in rest:
                plan = plan.filter(_merge_pred(g).col)
            joined = scope
        # guards never in scope would be a bug in the query
        if remaining:
            raise ValueError(f"guards reference unknown generators: {remaining}")
        return plan

    def select(self, head: Callable) -> "DataBag":
        """The comprehension head: projection over all generators."""
        from ..core import DataBag
        from ..functions.expr import normalize_projection

        plan = self._lower()
        ns = _Namespace(self._gens)
        out = head(ns)
        if isinstance(out, Mapping):
            cols = [
                (v.col if isinstance(v, TExpr) else v).alias(k) for k, v in out.items()
            ]
        else:
            out = out.col if isinstance(out, TExpr) else out
            cols = normalize_projection(out)
        return DataBag(plan.select(*cols))

    def bag(self) -> "DataBag":
        """No head: the flat joined tuple space."""
        from ..core import DataBag

        return DataBag(self._lower())


def comprehension(**gens: Any) -> Comprehension:
    """``for (a <- xs; b <- ys; if ...) yield ...`` — Python spelling."""
    return Comprehension(**gens)
