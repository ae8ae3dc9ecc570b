"""Density-matrix capacity demo on the real chip (VERDICT item 8).

n=14 (2n=28, double-buffered prefetch) and n=15 (2n=30, in-place aliased
split-half chains) noisy circuits: trace preservation, purity, and
probability checks, wall-clocks recorded.  Writes
bench_artifacts/density_demo.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from gpu_quantum_simulator_tpu.config import SimulatorConfig  # noqa: E402
from gpu_quantum_simulator_tpu.density import (  # noqa: E402
    DensitySimulator, NoisyCircuit)

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def build(n, depth=60, p=0.02, seed=5):
    rng = np.random.default_rng(seed)
    nc = NoisyCircuit(n)
    for i in range(depth):
        q = int(rng.integers(n))
        kind = int(rng.integers(4))
        if kind == 0:
            nc.h(q)
        elif kind == 1:
            nc.rz(float(rng.uniform(0, 2 * np.pi)), q)
        elif kind == 2:
            nc.cx(q, int((q + 1) % n))
        else:
            nc.channel("depolarizing", q, p=p)
    nc.channel("dephasing", 0, p=0.3)
    return nc


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    for n in (14, 15):
        nc = build(n)
        t0 = time.perf_counter()
        res = DensitySimulator(SimulatorConfig()).run(nc)
        probs = res.probabilities()
        wall = time.perf_counter() - t0
        purity = res.purity()
        tr = float(probs.sum())
        mode = "halves-inplace" if res.halves is not None else "flat"
        rec = {"n": n, "mode": mode, "seconds": round(wall, 2),
               "trace": tr, "purity": purity,
               "min_prob": float(probs.min())}
        print(rec, flush=True)
        assert abs(tr - 1.0) < 2e-3, f"trace drift {tr}"
        assert 0.0 < purity <= 1.0 + 1e-3
        out[f"n{n}"] = rec
    with open(os.path.join(ART, "density_demo.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE density_demo", flush=True)


if __name__ == "__main__":
    main()
