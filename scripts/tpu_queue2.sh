#!/bin/bash
# Follow-up TPU queue: the stages the first queue's 6 h deadline cuts off
# (noisy re-test after the ensemble-layout fix, large-n demos, Clifford
# validation, sweep stages 2/3) plus a re-bench under any flipped planner
# defaults.  Same rules as tpu_queue.sh: ONE process on the chip, hard
# deadline so the driver's round-end bench never overlaps.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue2.log; }

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

# 0. wait for the first queue to release the chip (never two TPU jobs)
run wait2 21600 bash -c 'while ps -p "$(cat /tmp/queue.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do sleep 30; done; echo chip free'

# 1. noisy ensemble demo — re-test of the tile-friendly layout fix
run noisy2 2400 python scripts/noisy_demo.py 16 1024

# 2. flagship bench under current defaults (records any planner flips)
run bench2 2400 python bench.py

# 3. large-n demos (VERDICT #1 artifacts)
run n29 7200 python scripts/n29_demo.py
run n30 7200 python scripts/n30_demo.py

# 4. independent n=30 Clifford validation vs exact CHP tableau
run clifford30 7200 python scripts/clifford30_check.py 30 4000 4096

# 5. sweep stage2: mxu 21-24 remainder + prefetch 18-26 re-measure
run sweep2 14400 python scripts/sweep_fill.py stage2

# 6. sweep stage3: vmem 16-18
run sweep3 7200 python scripts/sweep_fill.py stage3

# 7. consolidate the CSV + decision digest
run consolidate2 600 python scripts/sweep_fill.py consolidate
run digest2 600 python scripts/queue_digest.py
log "QUEUE2 DONE"
