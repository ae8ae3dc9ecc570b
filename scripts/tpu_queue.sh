#!/bin/bash
# Serialized TPU work queue for post-change measurement refresh.
# NEVER run two TPU jobs concurrently (shared HBM -> silent
# RESOURCE_EXHAUSTED); this script is the only thing touching the chip.
# Logs to bench_artifacts/queue_logs/; continues past individual failures.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a bench_artifacts/queue_logs/queue.log; }

# Hard deadline (epoch seconds): the driver runs bench.py on this same
# chip at round end — never let a queue job overlap it (shared HBM).
# Default: QSIM_QUEUE_DEADLINE env, else now + 6 h (the tunnel has been
# down most of the round; a late return must still leave the chip free
# for the driver's round-end bench).
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

# 1. verify drive: parity + sampling on the real chip
run verify 1800 python - <<'EOF'
import numpy as np
import gpu_quantum_simulator_tpu as Q
bell = Q.parse_qasm_file('/root/reference/entanglement.qasm')
v = Q.simulate(bell, strategy='mxu')
assert np.allclose(v, [2**-0.5, 0, 0, 2**-0.5], atol=1e-6), v
g = Q.parse_qasm_file('/root/reference/grover_3_18.qasm')
sim = Q.Simulator(Q.SimulatorConfig(strategy='mxu'))
res = sim.run_detailed(g)
p = np.abs(res.state)**2
assert set(np.argsort(p)[-2:].tolist()) == {3, 18}
print('mxu OK', res.seconds, flush=True)
sim2 = Q.Simulator(Q.SimulatorConfig(strategy='prefetch'))
res2 = sim2.run_detailed(g)
err = float(np.max(np.abs(res2.state - res.state)))
assert err < 1e-6, err
print('prefetch OK parity', err, res2.seconds, flush=True)
s = sim.sample(bell, 1000)
u, c = np.unique(s, return_counts=True)
assert set(u.tolist()) <= {0, 3} and min(c) > 380, (u, c)
print('sample OK', dict(zip(u.tolist(), c.tolist())), flush=True)
EOF

# 2. DMA bandwidth probe (shapes the streaming block-kernel design)
run dma24 3600 python scripts/dma_probe.py 24 32

# 3. kernel microbench at n=24 (validates the new per-step costs)
run micro24 3600 python scripts/kernel_microbench.py 24 64

# 3b. same through the manual streaming kernel (A/B vs Mosaic grid form)
run micro24s 3600 python scripts/kernel_microbench.py 24 64 stream

# 4. flagship bench at n=18 (grid form, then streaming A/B)
run bench 2400 python bench.py
run bench_stream 2400 env QSIM_STREAM_PLAIN=1 python bench.py
run bench_vmem 2400 env QSIM_BENCH_STRATEGY=vmem python bench.py
# mxu ran 0.12 s exec-only at n=18 this round — if it beats prefetch on
# the full-pipeline protocol too, it becomes the bench default
run bench_mxu 2400 env QSIM_BENCH_STRATEGY=mxu python bench.py

# 5. in-place microbench pair (halves-native + streaming split A/B) —
# cheap and decision-relevant, so it runs before the multi-hour stages
run micro24ip 3600 python scripts/kernel_microbench.py 24 64 inplace
run micro24ips 3600 python scripts/kernel_microbench.py 24 64 inplace stream

# 5b. variational workloads through iterated prefetch (n=24, one compile)
run variational 3600 python scripts/variational_demo.py 24 prefetch

# 5b2. device-resident VQE loop (adjoint scan; n=16, 60 adam steps)
run vqe 3600 python scripts/vqe_demo.py 16 3 60

# 5b2b. Grover-22 via iterated prefetch vs mxu (round-2 demo geometry)
run grover22 2400 python scripts/grover22_demo.py

# 5b3. TFIM quench: entanglement growth at n=24 (entropy via MXU rho)
run quench 3600 python scripts/quench_demo.py 24 120 0.05 20

# 5c. noisy trajectory-ensemble sampling (1024 shots, one batch)
run noisy 2400 python scripts/noisy_demo.py 16 1024

# 5c2. quantum volume at n=20: heavy-output probability from device
# samples (the IBM QV pass metric) + dense-block (KAK) workload timing
run qv20 3600 python scripts/qv_demo.py 20 20 2000

# 5d. planner-knob A/B (plan_model --tune candidates: max_high/cap_mats)
run knob_ab 3600 python scripts/knob_ab.py 24 26

# 5e. streamed-input relayout fold A/B (grid vs stream vs fold; the
# phase-3 design note — decides QSIM_STREAM_RELAYOUT's default)
run stream_relayout_ab 5400 python scripts/stream_relayout_ab.py 22 24

# 5f. precision ladder (highest/high/default): seconds + amplitude error
# at n=18 and n=24 — the documented accuracy/speed trade for sampling
run precision_ab 5400 python scripts/precision_ab.py 18 24

# 6. large-n demos with the new kernels
run n29 7200 python scripts/n29_demo.py
run n30 7200 python scripts/n30_demo.py

# 6b. independent n=30 validation: random Clifford through the in-place
# engine, every device sample checked against exact CHP tableau
# predictions (parity constraints + marginals + 64 pairwise <Z Z>)
run clifford30 7200 python scripts/clifford30_check.py 30 4000 4096

# 7. sweep stage2: mxu 21-24 remainder + prefetch 18-26 re-measure
run sweep2 14400 python scripts/sweep_fill.py stage2

# 8. sweep stage3: vmem 16-18 (compile-heavy, least urgent)
run sweep3 7200 python scripts/sweep_fill.py stage3

# 9. consolidate the CSV (freshest rows per strategy/n)
run consolidate 600 python scripts/sweep_fill.py consolidate

# 10. decision table into the logs (also runnable by hand any time)
run digest 600 python scripts/queue_digest.py
log "QUEUE DONE"
