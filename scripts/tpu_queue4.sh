#!/bin/bash
# Final round-3 TPU queue (replaces tpu_queue3.sh, which had a deadline
# past round end and would have collided with the driver's round-end
# bench).  Waits for queue2's in-flight diag24 stage, then RETIRES
# queue2 (its next stage, precision_ab2 at n=18+24, would eat the whole
# remaining window) and runs the highest-value remaining measurements
# in priority order under a hard deadline ~20 min before round end:
#   1. sweep26        — the missing prefetch n=26 committed-CSV row
#   2. n29high        — 3-pass HIGH rung on the n=29 flat headline
#                       (mats are MXU-bound at HIGHEST; ~2x mat headroom)
#   3. precision18    — precision ladder at n=18 with the HIGH emulation
#   4. n30knobshigh   — n=30 in-place with flat knobs + high precision
#   5. consolidate + digest + a final bench.py cache warm
# Same rules: ONE process on the chip, per-stage deadline guard.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue4.log; }

# hard deadline: round end (epoch 1787169633) minus 20 min
DEADLINE=${QSIM_QUEUE_DEADLINE:-1787168433}

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

# 0. wait for diag24 (queue2's in-flight stage) to release the chip
run wait4 7200 bash -c 'while ps -p "$(cat /tmp/diag24.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do sleep 15; done; echo diag24 done'

# 0b. retire queue2 by PID (never by pattern): kill its subtree so
#     precision_ab2 (which it launches the moment diag24 exits) stops.
Q2=$(cat /tmp/queue2.pid 2>/dev/null || echo 0)
if ps -p "$Q2" >/dev/null 2>&1; then
  for c in $(ps -o pid= --ppid "$Q2"); do
    for gc in $(ps -o pid= --ppid "$c"); do kill "$gc" 2>/dev/null; done
    kill "$c" 2>/dev/null
  done
  kill "$Q2" 2>/dev/null
  sleep 2
  kill -9 "$Q2" 2>/dev/null
  log "retired queue2 (pid $Q2)"
fi
rm -f /tmp/queue2.pid
sleep 5   # let any killed python release the chip

run sweep26 1500 python scripts/sweep_fill.py stage26
run n29high 2100 python scripts/inplace_knob_ab.py n29high
run precision18 900 python scripts/precision_ab.py 18
run n30knobshigh 2700 python scripts/inplace_knob_ab.py n30knobshigh
run consolidate4 300 python scripts/sweep_fill.py consolidate
run digest4 300 python scripts/queue_digest.py
run bench4 600 python bench.py

log "QUEUE4 DONE"
