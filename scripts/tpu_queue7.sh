#!/bin/bash
# Round-4 TPU queue, part 2 (queue6 was cut by a session restart after the
# n29/n30 demo refresh): the exec-only sweep ladders (VERDICT r3 #5), the
# n=24 full-row refresh under the auto-precision default (VERDICT r3 #2),
# and bench.  Stages ordered by value; the deadline cap drops the tail.
# ONE process on the chip at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue7.log; }

DEADLINE=${QSIM_QUEUE_DEADLINE:?set QSIM_QUEUE_DEADLINE}

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

run stage24 1200 python scripts/sweep_fill.py stage24
run exec1 2400 python scripts/sweep_fill.py exec1
run exec3 1800 python scripts/sweep_fill.py exec3
run bench7 600 python bench.py
run exec2 1800 python scripts/sweep_fill.py exec2
run consolidate7 300 python scripts/sweep_fill.py consolidate
run digest7 300 python scripts/queue_digest.py

log "QUEUE7 DONE"
