"""n=30 single-chip demonstration — real chip.

n=30 runs the prefetch engine in IN-PLACE mode (aliased split-half chains;
an (in, out) f32 state pair would be 17 GB > 16 GB HBM).  All timings force
a device->host scalar fetch (block_until_ready can return early through the
dev tunnel).  Writes bench_artifacts/n30_demo.json.
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
        "precision": f"auto->{sim30.config.effective_precision(n)}",
        "device": "tpu-v5e-1chip", "state_bytes": 2 * (1 << 30) * 4,
        "cold_seconds": round(cold30, 2),
        "warm_seconds_median": round(float(np.median(ts)), 3),
        "norm": norm, "sampling_unique_of_1000": uniq,
        "reference_ceiling": {"n": 22, "best_seconds": 51.68},
    }
    with open(os.path.join(ART, "n30_demo.json"), "w") as f:
        json.dump(out30, f, indent=1)
    print(json.dumps(out30), flush=True)
    # NOTE: this script used to chase an n=29 mxu run + the n=18/24
    # fusion A/B here, in-process after the 8.6 GB n=30 run.  The wide
    # engine caps at n=28 (per-segment temporaries) and the post-run
    # fragmented heap refuses its big contiguous buffers anyway
    # (RESOURCE_EXHAUSTED, queue_logs/n30.log 2026-08-19) — the mxu A/B
    # lives in scripts/fusion_ab.py, which must run in a FRESH process.
    print("DONE n30", flush=True)


if __name__ == "__main__":
    main()
