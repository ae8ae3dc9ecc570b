"""A/B the fusion cost model under the wide (mxu) engine on the real chip.

VERDICT #9 done-criterion: windowed+cost-model fusion must be faster than
window-1 first-fit at n=18 and n=24.  Also runs the n=29 mxu wall-clock
(the 51.68 s reference-ceiling comparison, bench_artifacts/n29_demo.json
companion).  Warm medians; compiles are one-time (persistent cache).
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

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def timed(sim, c, runs=5):
    re, im, nops = sim.run_device(c)  # warm / compile
    jax.block_until_ready(re)
    del re, im
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        re, im, _ = sim.run_device(c)
        jax.block_until_ready(re)
        ts.append(time.perf_counter() - t0)
        del re, im
    return float(np.median(ts)), nops


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    for n, runs in ((18, 5), (24, 3)):
        c = models.grover_like(n, num_gates=2445, seed=318)
        for tag, kw in (
            ("w1", {}),
            ("cm-w8", dict(fusion_window=8, fusion_cost_model=True)),
        ):
            sim = Simulator(SimulatorConfig(strategy="mxu", **kw))
            t, nops = timed(sim, c, runs)
            out[f"mxu_n{n}_{tag}"] = {"seconds": round(t, 4), "ops": nops}
            print(f"n={n} {tag}: {t:.3f}s ({nops} ops)", flush=True)

    # n=29: the reference-ceiling beat attempt
    n = 29
    c = models.grover_like(n, num_gates=2445, seed=29)
    sim = Simulator(SimulatorConfig(strategy="mxu", fusion_window=8,
                                    fusion_cost_model=True))
    t0 = time.perf_counter()
    re, im, nops = sim.run_device(c)
    jax.block_until_ready(re)
    print(f"n=29 mxu cold: {time.perf_counter()-t0:.1f}s ({nops} ops)", flush=True)
    del re, im
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        re, im, _ = sim.run_device(c)
        jax.block_until_ready(re)
        ts.append(time.perf_counter() - t0)
        print(f"n=29 mxu warm[{i}]: {ts[-1]:.2f}s", flush=True)
        del re, im
    out["mxu_n29_cm-w8"] = {"seconds": round(float(np.median(ts)), 3),
                            "ops": nops,
                            "reference_n22_best": 51.68}

    with open(os.path.join(ART, "fusion_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("DONE fusion_ab", flush=True)


if __name__ == "__main__":
    main()
