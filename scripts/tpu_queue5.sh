#!/bin/bash
# Round-3 closing TPU queue: refresh the n=30 demo under the flipped
# in-place planner defaults (mono-as-mat + w16/cap8, justified by the
# n30knobs/n30knobshigh arms of inplace_knob_ab.json), then complete the
# committed sweep record to every documented ladder ceiling (stage1 =
# reference 15-18, naive 9-10, fused* 9-12, scan/megakernel 15-16, the
# whole pallas 5-14 ladder; stage3 = vmem 18), consolidate, digest, and
# leave the driver's round-end bench caches warm.  Hard deadline ~20 min
# before round end; ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue5.log; }

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

run n30demo2 1500 python scripts/n30_demo.py
run stage1 2700 python scripts/sweep_fill.py stage1
run stage3b 600 python scripts/sweep_fill.py stage3
run consolidate5 300 python scripts/sweep_fill.py consolidate
run digest5 300 python scripts/queue_digest.py
run bench5 600 python bench.py

log "QUEUE5 DONE"
