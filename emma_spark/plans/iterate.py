"""Driver-loop iteration with auto-caching (SURVEY §2.8, §4 #9).

Reference: while/do-while loops run on the driver; loop-invariant and
loop-carried bags are auto-cached by a compiler pass
(``compiler/opt/Caching.scala:57-130``: cache when used >1x, passed as
loop argument, or referenced from a loop closure); the Spark runtime
combinator is ``SparkOps.cache`` (``SparkOps.scala:54-59``).

Spark never auto-caches, so this module is the rebuild of that pass as
a *runtime service*: :func:`fixpoint` owns persistence of the loop-
carried bag, truncates lineage each iteration (localCheckpoint — long
lineage chains are the classic iterative-Spark failure mode), and
unpersists superseded states (an improvement over the reference, which
never unpersists — SURVEY §7.3).
"""

from __future__ import annotations

from typing import Callable

from ..core import DataBag  # noqa: F401  (re-export for callers)


def _content_sig(df) -> tuple:
    """(count, Σ xxhash64(row)) — a one-pass multiset-content signature.
    Row order and partitioning can't change it; any content change does
    (modulo a vanishing 64-bit collision chance)."""
    from pyspark.sql import functions as F

    # sum in decimal(38,0): full-range 64-bit hashes overflow a bigint
    # sum under ANSI mode
    row = F.xxhash64(F.struct(*[df[c] for c in df.columns])).cast("decimal(38,0)")
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(row).alias("h")).collect()[0]
    return (r["n"], r["h"])


def fixpoint(
    init: "DataBag",
    step: Callable[["DataBag"], "DataBag"],
    converged: Callable[["DataBag", "DataBag"], bool] | None = None,
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> "DataBag":
    """Iterate ``state = step(state)`` until ``converged(old, new)``.

    Default convergence is a CONTENT probe — (count, row-hash-sum)
    equality with the previous state — valid for any step, including
    value-propagation steps whose row count never changes (a bare count
    probe, the reference's usual fixpoint test,
    ``transitiveClosure.scala:27-41``, would falsely converge there).
    Pass ``converged`` for a cheaper problem-specific probe (e.g. the
    monotone label-sum in connected components)."""
    from ..core import DataBag as DB

    state = DB(init.df.localCheckpoint(eager=True))
    prev_sig = _content_sig(state.df) if converged is None else None
    for i in range(max_iter):
        nxt = step(state)
        if (i + 1) % checkpoint_every == 0:
            nxt = DB(nxt.df.localCheckpoint(eager=True))
        if converged is not None:
            if converged(state, nxt):
                state.df.unpersist()
                return nxt
        else:
            sig = _content_sig(nxt.df)
            if sig == prev_sig:
                state.df.unpersist()
                return nxt
            prev_sig = sig
        state.df.unpersist()
        state = nxt
    return state
