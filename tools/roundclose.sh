#!/bin/bash
# Round-close verification ritual (one command, run serially — never
# concurrently with another Spark session; bench timing especially).
# Each step appends to .local/roundclose_<tag>.log; the script stops
# on the first red so a failure is the first thing in the tail.
#
#   bash tools/roundclose.sh r9
#
# Steps (the standing ritual assembled from r7-r9 verdict asks):
#   1. full pytest                      (correctness + fixed-seed fuzz)
#   2. staleness audit                  (changed tier empty / staged)
#   3. cross-family fuzz --all          (every table-backed oracle on
#                                        the unified adversarial corpus)
#   4. tri-SF vanilla sweep, window     (what the driver will run)
#   5. full-registry sf0.001 sweep      (nothing outside the window
#                                        regressed)
#   6. bench sf0.1 + sf1 scaling curve  (per-round curve catches new
#                                        super-linear terms)
#   7. plan audit, bench headliners     (CartesianProduct /
#                                        BatchEvalPython = red)
set -e
TAG="${1:-rX}"
mkdir -p .local
LOG=".local/roundclose_${TAG}.log"
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "1/7 pytest"
python -m pytest tests/ -q 2>&1 | tail -2 | tee -a "$LOG"

note "2/7 staleness"
python tools/staleness.py 2>&1 | head -1 | tee -a "$LOG"

note "3/7 cross-family fuzz --all"
python tools/fuzzcheck_cross.py --all 2>/dev/null | tail -2 | tee -a "$LOG"

note "3b/7 shape tiers (empty / monokey-skew / epoch-straddle / matched)"
python tools/fuzzcheck_empty.py 2>/dev/null | tail -1 | sed 's/^/empty: /' | tee -a "$LOG"
python tools/fuzzcheck_skew.py 2>/dev/null | tail -1 | sed 's/^/skew:  /' | tee -a "$LOG"
python tools/fuzzcheck_epoch.py 2>/dev/null | tail -1 | sed 's/^/epoch: /' | tee -a "$LOG"
python tools/fuzzcheck_domainmax.py 2>/dev/null | tail -1 | sed 's/^/dmax:  /' | tee -a "$LOG"
python tools/fuzzcheck_negzero.py 2>/dev/null | tail -1 | sed 's/^/negz:  /' | tee -a "$LOG"
# matched-sparse (r10): facts sliced WITH FKs rewritten onto kept keys
# — degenerate MATCHED groups, the shape sparse/monokey cannot produce
python tools/fuzzcheck_matched.py 2>/dev/null | tail -1 | sed 's/^/match: /' | tee -a "$LOG"
# ties (r10): full-cardinality constant measures/timestamps/text/
# vectors — every selection-among-equals must be deterministically
# pinned on both engines
python tools/fuzzcheck_ties.py 2>/dev/null | tail -1 | sed 's/^/ties:  /' | tee -a "$LOG"
# all-NULL measures (r10): rows exist, values don't — the aggregate-
# NULL regime between the 4%-mixed joins corpus and the empty tier
python tools/fuzzcheck_nullmeasures.py 2>/dev/null | tail -1 | sed 's/^/nullm: /' | tee -a "$LOG"
# exotic props (r10): corrupt/duplicate-key/path-colliding JSON
# documents — the parser-quarantine contract on both engines
python tools/fuzzcheck_props.py 2>/dev/null | tail -1 | sed 's/^/props: /' | tee -a "$LOG"
# restart-resume (r11): every stream workload drained in TWO
# checkpointed availableNow runs (split staged corpus) vs the batch
# oracle — watermark carry-over / state recovery / the far-future
# poison class no single-run tier can reach
python tools/fuzzcheck_restart.py 2>/dev/null | tail -1 | sed 's/^/rstrt: /' | tee -a "$LOG"

note "4/7 tri-SF window sweep"
WINDOW=$(python -c "from emma_spark.workloads import _PRIORITY; print(' '.join(_PRIORITY))" 2>/dev/null)
for SF in 0.001 0.01 0.1; do
  python tools/diffcheck.py --vanilla "/root/testdata/sf${SF}" $WINDOW 2>/dev/null \
    | tail -1 | sed "s/^/sf${SF}: /" | tee -a "$LOG"
done

note "5/7 full-registry sf0.001 sweep"
python tools/diffcheck.py --vanilla /root/testdata/sf0.001 2>/dev/null \
  | tail -1 | tee -a "$LOG"

note "6/7 bench sf0.1 + sf1 curve"
python bench.py 2>/dev/null | tail -1 | tee -a "$LOG"
if [ -d .local/sf1 ]; then
  SPARK_GRAFT_SF_DIR=.local/sf1 python bench.py 2>/dev/null | tail -1 | tee -a "$LOG"
else
  echo "(.local/sf1 missing — regenerate with tools/gen_sf.py)" | tee -a "$LOG"
fi

note "7/7 plan audit (bench headliners)"
HEADS=$(python -c "
from emma_spark.workloads import load_all
print(' '.join(n for n, q in load_all().items() if q.headline))" 2>/dev/null)
python tools/planaudit.py $HEADS 2>/dev/null | tail -25 | tee -a "$LOG"

note "7a/7 BNLJ bounded-class audit at sf0.1 (measured, not asserted)"
# every documented BroadcastNestedLoopJoin's build side must stay a
# k-row constant at bench scale (r10 verdict ask #6)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/planaudit.py --bnlj 2>/dev/null \
  | tee -a "$LOG"

note "7b/7 redundant-scan audit (full registry)"
# same-table FileScan multiplicity in one lazy plan: the
# 1-row-aggregate fan-out pathology (r9 found 24x/48x instances).
# Dim tables (region/nation) and size-gated toy-graph unrolls are the
# documented benign classes — judge the table named in each flag.
python tools/scanaudit.py 2>/dev/null | tail -25 | tee -a "$LOG"

note "done — full log in $LOG"
