"""Reproducible physical-plan audit.

Dumps ``explain("formatted")`` for every HEADLINE query (or any names
passed on the command line) so the invariants documented in
docs/PLANS.md can be re-verified against the actual plans instead of
trusted as prose. Also greps each plan for the red flags the plan
tests assert on and prints a one-line verdict per query.

Usage:
    python tools/planaudit.py [query ...]        # default: headliners
    python tools/planaudit.py --all              # every registry entry
    PLAN_DUMP_DIR=/tmp/plans python tools/planaudit.py   # keep dumps
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

RED_FLAGS = (
    # (marker, why it's a 100 TB problem)
    ("CartesianProduct", "unbounded pair blow-up"),
    ("BatchEvalPython", "row-at-a-time Python in the hot path"),
)
YELLOW_FLAGS = (
    ("BroadcastNestedLoopJoin", "theta-join fallback (OK only if semantically theta)"),
)


def main() -> int:
    from emma_spark.session import get_spark
    from emma_spark.workloads import load_all

    argv = [a for a in sys.argv[1:] if a != "--all"]
    use_all = "--all" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    dump_dir = os.environ.get("PLAN_DUMP_DIR")

    spark = get_spark("planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    names = argv or [
        n for n, q in reg.items() if (use_all or q.headline)
        # streaming queries execute on .start(); their batch-side plan
        # string is not the executed plan, so they are skipped here
        if not n.startswith("stream_")
    ]

    n_red = 0
    for name in names:
        q = reg[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - audit tool
            print(f"ERR   {name}: {ex!r}"[:300])
            n_red += 1
            continue
        reds = [(m, why) for m, why in RED_FLAGS if m in plan]
        yellows = [(m, why) for m, why in YELLOW_FLAGS if m in plan]
        codegen = plan.count("*(")
        tag = "RED " if reds else ("warn" if yellows else "ok  ")
        notes = "; ".join(f"{m} ({why})" for m, why in reds + yellows)
        print(f"{tag}  {name}: codegen_stages={codegen}"
              + (f"  {notes}" if notes else ""))
        if reds:
            n_red += 1
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, f"{name}.plan.txt"), "w") as f:
                f.write(plan)
    spark.stop()
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
