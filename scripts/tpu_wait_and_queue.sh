#!/bin/bash
# Wait for the axon tunnel to answer, then run the serialized TPU work
# queue (scripts/tpu_queue.sh).  Probe cadence is gentle: a failed probe
# holds a process slot for up to 10 min (first-touch stalls reach 350 s,
# so anything shorter misclassifies a live-but-cold tunnel as down).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/wait.log; }

for attempt in $(seq 1 48); do
  log "probe $attempt"
  if timeout 600 python -c "import jax; print(jax.devices())" \
      > bench_artifacts/queue_logs/probe.log 2>&1; then
    log "tunnel up: $(tail -1 bench_artifacts/queue_logs/probe.log)"
    bash scripts/tpu_queue.sh
    exit 0
  fi
  if [ -n "${QSIM_QUEUE_DEADLINE:-}" ] \
      && [ "$(date +%s)" -ge "$QSIM_QUEUE_DEADLINE" ]; then
    log "deadline passed while waiting; giving up"
    exit 1
  fi
  log "probe $attempt failed; sleeping 300"
  sleep 300
done
log "tunnel never came back"
exit 1
