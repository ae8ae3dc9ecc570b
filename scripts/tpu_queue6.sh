#!/bin/bash
# Round-4 TPU queue: refresh the headline artifacts under the committed
# auto-precision default (VERDICT r3 #1/#2 — n29/n30 demos, the n=24 sweep
# row, bench.py), then land the exec-only sweep column to every strategy's
# honest ceiling (VERDICT r3 #5).  ONE process on the chip at a time; every
# stage is its own process (post-run heap fragmentation, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue6.log; }

DEADLINE=${QSIM_QUEUE_DEADLINE:-1787224000}

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

run n29demo 1500 python scripts/n29_demo.py
run n30demo 1800 python scripts/n30_demo.py
run exec1 4200 python scripts/sweep_fill.py exec1
run exec3 3000 python scripts/sweep_fill.py exec3
run stage24 1200 python scripts/sweep_fill.py stage24
run exec2 3600 python scripts/sweep_fill.py exec2
run consolidate6 300 python scripts/sweep_fill.py consolidate
run digest6 300 python scripts/queue_digest.py
run bench6 600 python bench.py

log "QUEUE6 DONE"
