#!/bin/bash
# Round-5 TPU queue: the deadline-killed exec ladders to the reference
# grid (round-4 verdict #2), full-row gap fixes, headline re-pin under
# round-5 code, then consolidate + bench.  ONE process on the chip at a
# time (CLAUDE.md); stages ordered by verdict value so a deadline kill
# drops the tail.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue8.log; }

DEADLINE=${QSIM_QUEUE_DEADLINE:?set QSIM_QUEUE_DEADLINE}

# serialize behind a still-running diag24 refresh (marker: its final JSON
# line for the last arm, or process exit makes the log stop growing)
for i in $(seq 1 120); do
  if grep -q "n26_mxu" bench_artifacts/queue_logs/diag24_r5.log 2>/dev/null; then
    break
  fi
  sleep 30
done

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

run exec1 1500 python scripts/sweep_fill.py exec1
run exec1b 1500 python scripts/sweep_fill.py exec1b
run exec1c 1500 python scripts/sweep_fill.py exec1c
run exec1d 1500 python scripts/sweep_fill.py exec1d
run fullfix 1800 python scripts/sweep_fill.py fullfix
run exec3a 1500 python scripts/sweep_fill.py exec3a
run exec3b 1800 python scripts/sweep_fill.py exec3b
run exec2a 1200 python scripts/sweep_fill.py exec2a
run exec2b 1500 python scripts/sweep_fill.py exec2b
run exec2c 1500 python scripts/sweep_fill.py exec2c
run pallas_full 1500 python scripts/sweep_fill.py pallas_full
run n29r5 1800 python scripts/n29_demo.py
run n30r5 2400 python scripts/n30_demo.py
run consolidate8 300 python scripts/sweep_fill.py consolidate
run bench8 900 python bench.py
run digest8 300 python scripts/queue_digest.py

log "QUEUE8 DONE"
