"""n=29 single-chip demonstration (BASELINE north star: exceed the
reference's demonstrated scale — its ceiling is n=22, OverallTest.csv 4x4
section, best 51.68 s).

Runs the 2445-gate grover-profile workload at n=29 (state pair: 2 x 2.1 GB
f32; 512x the reference-ceiling state), verifies norm + device-side
sampling, and writes bench_artifacts/n29_demo.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from gpu_quantum_simulator_tpu import models  # noqa: E402
from gpu_quantum_simulator_tpu.config import SimulatorConfig  # noqa: E402
from gpu_quantum_simulator_tpu.engine.simulator import Simulator  # noqa: E402
from gpu_quantum_simulator_tpu.sampling import (  # noqa: E402
    norm_device, sample_state_device)

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)

N = 29
GATES = 2445


def main():
    print("backend:", jax.default_backend(), flush=True)
    c = models.grover_like(N, num_gates=GATES, seed=29)
    sim = Simulator(SimulatorConfig(strategy="prefetch"))

    t0 = time.perf_counter()
    re, im, nops = sim.run_device(c)
    jax.block_until_ready(re)
    cold = time.perf_counter() - t0
    print(f"cold (incl compile+plan+H2D): {cold:.1f}s items={nops}", flush=True)

    norm = float(norm_device(re, im))
    print(f"norm: {norm:.8f}", flush=True)
    samples = np.asarray(sample_state_device(re, im, N, 1000, 0))
    uniq = int(len(np.unique(samples)))
    print(f"sampling: {uniq} unique outcomes in 1000 draws", flush=True)
    del re, im

    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        re, im, _ = sim.run_device(c)
        jax.block_until_ready(re)
        ts.append(time.perf_counter() - t0)
        print(f"warm[{i}]: {ts[-1]:.2f}s", flush=True)
        del re, im
    warm = float(np.median(ts))

    out = {
        "n": N,
        "gates": GATES,
        "strategy": "prefetch",
        "precision": f"auto->{sim.config.effective_precision(N)}",
        "device": "tpu-v5e-1chip",
        "state_bytes": 2 * (1 << N) * 4,
        "cold_seconds": round(cold, 2),
        "warm_seconds_median": round(warm, 3),
        "norm": norm,
        "sampling_unique_of_1000": uniq,
        "reference_ceiling": {"n": 22, "best_seconds": 51.68,
                              "source": "OverallTest.csv 4x4 section"},
    }
    with open(os.path.join(ART, "n29_demo.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("DONE n29", flush=True)


if __name__ == "__main__":
    main()
