"""Quantum-volume demo: run the Haar-SU(4) brickwork at a given width and
score the heavy-output probability (HOP) from device samples against the
ideal distribution — the actual IBM QV pass metric (HOP > 2/3).

The amplitudes are f32 on device; the ideal heavy set is computed from the
same run's probabilities (device-side), so the metric tests the SAMPLER +
engine end to end, not f32-vs-f64 drift.

Usage: python scripts/qv_demo.py [n=20] [depth=n] [shots=2000]
Writes bench_artifacts/qv_demo.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else n
    shots = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    from gpu_quantum_simulator_tpu import Simulator, SimulatorConfig, models

    t0 = time.perf_counter()
    circ = models.quantum_volume(n, depth=depth, seed=318)
    t_build = time.perf_counter() - t0

    sim = Simulator(SimulatorConfig(strategy="mxu"))
    t0 = time.perf_counter()
    res = sim.run_detailed(circ)
    state = np.asarray(res.state)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    sim.run_detailed(circ)
    t_warm = time.perf_counter() - t0

    p = np.abs(state) ** 2
    median = np.median(p)
    heavy = p > median
    ideal_hop = float(p[heavy].sum())

    t0 = time.perf_counter()
    samples = sim.sample(circ, shots, seed=7)
    t_sample = time.perf_counter() - t0
    hop = float(np.mean(heavy[np.asarray(samples)]))

    rec = {
        "n": n, "depth": depth, "shots": shots,
        "num_gates": res.num_gates, "num_fused_ops": res.num_fused_ops,
        "build_s": round(t_build, 4),
        "first_run_s": round(t_first, 4),
        "warm_run_s": round(t_warm, 4),
        "sample_s": round(t_sample, 4),
        "ideal_hop": round(ideal_hop, 5),
        "sampled_hop": round(hop, 5),
        "qv_pass": bool(hop > 2.0 / 3.0),
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts", "qv_demo.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
