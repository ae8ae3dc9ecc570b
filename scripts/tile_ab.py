"""A/B the prefetch VMEM tile height (TILE_ROWS) on the real chip.

Bigger tiles turn the hottest cross-tile bits into free in-tile row swaps
(logt 9 -> 11 moves qubits 17..18 in-tile) and make n <= 19 single-tile.
Measures plan shape + warm medians at n=18/24 for T in {512, 1024, 2048}.
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
from gpu_quantum_simulator_tpu.engine import prefetch as PF  # noqa: E402
from gpu_quantum_simulator_tpu.engine.simulator import Simulator  # noqa: E402


def force(x):
    return float(np.asarray(x[:1])[0])


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    for T in (512, 1024, 2048):
        PF.TILE_ROWS = T
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        PF._PROGRAM_CACHE.clear()
        PF._RUN_CACHE.clear()
        for n, runs in ((18, 5), (24, 3)):
            c = models.grover_like(n, num_gates=2445, seed=318)
            sim = Simulator(SimulatorConfig(strategy="prefetch"))
            t0 = time.perf_counter()
            re, im, nops = sim.run_device(c)
            force(re)
            cold = time.perf_counter() - t0
            del re, im
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                re, im, _ = sim.run_device(c)
                force(re)
                ts.append(time.perf_counter() - t0)
                del re, im
            med = float(np.median(ts))
            out[f"T{T}_n{n}"] = {"seconds": round(med, 4), "items": nops,
                                 "cold": round(cold, 1)}
            print(f"T={T} n={n}: {med:.3f}s ({nops} items, cold {cold:.1f}s)",
                  flush=True)
    print(json.dumps(out), flush=True)
    print("DONE tile_ab", flush=True)


if __name__ == "__main__":
    main()
