"""n=30 single-chip demonstration + n=29 mxu + fusion A/B — real chip.

n=30 runs the prefetch engine in IN-PLACE mode (aliased split-half chains;
an (in, out) f32 state pair would be 17 GB > 16 GB HBM).  All timings force
a device->host scalar fetch (block_until_ready can return early through the
dev tunnel).  Writes bench_artifacts/n30_demo.json + fusion_ab.json.
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
    norm_halves, sample_halves)

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def force(x):
    """Synchronize for real: fetch one element to the host."""
    return float(np.asarray(x[:1])[0])


def timed_runs(sim, c, runs):
    ts = []
    nops = None
    for _ in range(runs):
        t0 = time.perf_counter()
        re, im, nops = sim.run_device(c)
        force(re)
        ts.append(time.perf_counter() - t0)
        del re, im
    return ts, nops


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---------------- n=30 prefetch in-place ----------------
    n = 30
    c30 = models.grover_like(n, num_gates=2445, seed=30)
    sim30 = Simulator(SimulatorConfig(strategy="prefetch"))
    t0 = time.perf_counter()
    parts, nops = sim30.run_device_halves(c30)
    force(parts[0][:, 0])
    cold30 = time.perf_counter() - t0
    print(f"n=30 cold (incl compiles+plan+H2D): {cold30:.1f}s items={nops}",
          flush=True)
    norm = float(norm_halves(*parts))
    print(f"n=30 norm: {norm:.8f}", flush=True)
    samples = np.asarray(sample_halves(*parts, n, 1000, 0))
    uniq = int(len(np.unique(samples)))
    print(f"n=30 sampling: {uniq} unique / 1000 draws", flush=True)
    del parts
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        parts, _ = sim30.run_device_halves(c30)
        force(parts[0][:, 0])
        ts.append(time.perf_counter() - t0)
        print(f"n=30 warm[{i}]: {ts[-1]:.2f}s", flush=True)
        del parts
    print(f"n=30 warm runs: {['%.2f' % t for t in ts]}", flush=True)
    out30 = {
        "n": 30, "gates": 2445, "strategy": "prefetch-inplace",
        "device": "tpu-v5e-1chip", "state_bytes": 2 * (1 << 30) * 4,
        "cold_seconds": round(cold30, 2),
        "warm_seconds_median": round(float(np.median(ts)), 3),
        "norm": norm, "sampling_unique_of_1000": uniq,
        "reference_ceiling": {"n": 22, "best_seconds": 51.68},
    }
    with open(os.path.join(ART, "n30_demo.json"), "w") as f:
        json.dump(out30, f, indent=1)
    print(json.dumps(out30), flush=True)

    # ---------------- n=29 via the wide (mxu) engine ----------------
    n = 29
    c29 = models.grover_like(n, num_gates=2445, seed=29)
    sim29 = Simulator(SimulatorConfig(strategy="mxu", fusion_window=8,
                                      fusion_cost_model=True))
    t0 = time.perf_counter()
    re, im, nops = sim29.run_device(c29)
    force(re)
    print(f"n=29 mxu cold: {time.perf_counter()-t0:.1f}s ({nops} ops)", flush=True)
    del re, im
    ts29, _ = timed_runs(sim29, c29, 3)
    print(f"n=29 mxu warm: {['%.2f' % t for t in ts29]}", flush=True)

    # ---------------- fusion A/B at n=18 / n=24 ----------------
    ab = {"mxu_n29_cm-w8": {"seconds": round(float(np.median(ts29)), 3),
                            "ops": nops, "reference_n22_best": 51.68}}
    for nn, runs in ((18, 5), (24, 3)):
        c = models.grover_like(nn, num_gates=2445, seed=318)
        for tag, kw in (("w1", {}),
                        ("cm-w8", dict(fusion_window=8, fusion_cost_model=True))):
            sim = Simulator(SimulatorConfig(strategy="mxu", **kw))
            _ = timed_runs(sim, c, 1)  # warm-up/compile
            ts, nops = timed_runs(sim, c, runs)
            ab[f"mxu_n{nn}_{tag}"] = {"seconds": round(float(np.median(ts)), 4),
                                      "ops": nops}
            print(f"n={nn} {tag}: {np.median(ts):.3f}s ({nops} ops)", flush=True)

    with open(os.path.join(ART, "fusion_ab.json"), "w") as f:
        json.dump(ab, f, indent=1)
    print(json.dumps(ab), flush=True)
    print("DONE n30", flush=True)


if __name__ == "__main__":
    main()
