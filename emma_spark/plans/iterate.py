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


def fixpoint(
    init: "DataBag",
    step: Callable[["DataBag"], "DataBag"],
    converged: Callable[["DataBag", "DataBag"], bool] | None = None,
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> "DataBag":
    """Iterate ``state = step(state)`` until ``converged(old, new)``.

    Default convergence = count equality with the previous state (the
    reference's usual fixpoint probe: size deltas / nonEmpty on a delta
    bag, ``transitiveClosure.scala:27-41``, ``ConnectedComponents.scala:33``).
    """
    from ..core import DataBag as DB

    state = DB(init.df.localCheckpoint(eager=True))
    prev_count = state.df.count() if converged is None else None
    for i in range(max_iter):
        nxt = step(state)
        if (i + 1) % checkpoint_every == 0:
            nxt = DB(nxt.df.localCheckpoint(eager=True))
        if converged is not None:
            if converged(state, nxt):
                state.df.unpersist()
                return nxt
        else:
            n = nxt.df.count()
            if n == prev_count:
                state.df.unpersist()
                return nxt
            prev_count = n
        state.df.unpersist()
        state = nxt
    return state
