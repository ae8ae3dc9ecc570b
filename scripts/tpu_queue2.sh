#!/bin/bash
# Follow-up TPU queue (rewritten 2026-08-19 15:20 after queue1 reached its
# own sweep stages — the first draft's sweep2/sweep3 repeats are dropped):
#   queue1 delivered n29 (76.7 s warm, new defaults), n30 (156.9 s),
#   QV-20, quench, grover22, clifford30 (ok), sweep stage2, and is
#   finishing sweep stage3 + consolidate + digest itself.  What's left:
#   - noisy2: re-test after the tile-friendly ensemble-layout fix
#   - bench2: flagship bench under the flipped planner defaults (also
#     warms the persistent compile + plan caches for the driver's
#     round-end bench)
#   - diag24: exec vs D2H-fetch split for grid/fold arms at n=24/26 —
#     the honest engine numbers that decide the QSIM_STREAM_RELAYOUT
#     default at large n (the earlier A/Bs timed run_detailed, which
#     buries a 128-512 MB tunnel fetch in the comparison)
#   - precision_ab2: re-run after the Mosaic HIGH-dot 3-pass emulation
#   - digest
# Same rules as tpu_queue.sh: ONE process on the chip, hard deadline so
# the driver's round-end bench never overlaps.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue2.log; }

DEADLINE=${QSIM_QUEUE_DEADLINE:-$(( $(date +%s) + 4 * 3600 ))}

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

# 2. flagship bench under current defaults (records the planner flips,
#    warms the persistent caches for the driver's round-end run)
run bench2 2400 python bench.py

# 3. honest exec/fetch split, grid vs fold, n=24/26 (fold-default lever)
run diag24 7200 python scripts/diag24.py 24 26

# 4. precision ladder, re-run with the 3-pass HIGH emulation
run precision_ab2 5400 python scripts/precision_ab.py 18 24

# 5. decision digest
run digest2 600 python scripts/queue_digest.py
log "QUEUE2 DONE"
