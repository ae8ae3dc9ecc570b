#!/bin/bash
# Third TPU queue (chained behind tpu_queue2.sh): the large-n knob +
# precision A/B that queue2's diag24/precision_ab2 data motivates.
#   - inplace_ab: n=29 flat high rung; n=30 in-place with the flat
#     planner knobs (w16/cap8/mono-as-mat) at highest AND high —
#     decides the in-place defaults + whether the committed n29/n30
#     headline demos get re-run under a winner.
# Same rules: ONE process on the chip, per-stage deadline guard.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue3.log; }

DEADLINE=${QSIM_QUEUE_DEADLINE:-$(( $(date +%s) + 6 * 3600 ))}

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local now left
  now=$(date +%s); left=$(( DEADLINE - now ))
  if [ "$left" -le 120 ]; then
    log "SKIP $name (deadline reached)"
    return
  fi
  [ "$to" -gt "$left" ] && to=$left
  log "START $name (budget ${to}s)"
  timeout "$to" "$@" > "bench_artifacts/queue_logs/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc"
}

# 0. wait for queue2 to release the chip (never two TPU jobs)
run wait3 21600 bash -c 'while ps -p "$(cat /tmp/queue2.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do sleep 30; done; echo chip free'

# 1. fill the missing prefetch n=26 sweep row in a FRESH process
#    (sweep2 hit RESOURCE_EXHAUSTED at 26 after running 18-25 in one
#    process — post-run heap fragmentation, the known n>=26 hazard)
run sweep26 3600 python scripts/sweep_fill.py stage26

# 2. large-n knob + precision A/B (n=29 flat, n=30 in-place)
run inplace_ab 7200 python scripts/inplace_knob_ab.py

# 3. consolidate the CSV with the n=26 row + refresh the digest
run consolidate3 600 python scripts/sweep_fill.py consolidate
run digest3 600 python scripts/queue_digest.py

log "QUEUE3 DONE"
