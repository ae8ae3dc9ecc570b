"""A/B the fusion cost model under the wide (mxu) engine on the real chip.

VERDICT #9 done-criterion: windowed+cost-model fusion must beat window-1
first-fit at n=18 and n=24.  All timings force a device->host scalar fetch
(block_until_ready can return early through the dev tunnel).  The wide
engine caps at n=28 on one chip (per-segment temporaries), so the n=29+
scale story belongs to the prefetch engine (scripts/n30_demo.py).
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


def force(x):
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
    ab = {}
    for nn, runs in ((18, 5), (24, 3)):
        c = models.grover_like(nn, num_gates=2445, seed=318)
        for tag, kw in (("w1", {}),
                        ("cm-w8", dict(fusion_window=8, fusion_cost_model=True))):
            sim = Simulator(SimulatorConfig(strategy="mxu", **kw))
            _ = timed_runs(sim, c, 1)  # warm-up / compile
            ts, nops = timed_runs(sim, c, runs)
            ab[f"mxu_n{nn}_{tag}"] = {"seconds": round(float(np.median(ts)), 4),
                                      "ops": nops}
            print(f"n={nn} {tag}: {np.median(ts):.3f}s ({nops} ops)", flush=True)

    with open(os.path.join(ART, "fusion_ab.json"), "w") as f:
        json.dump(ab, f, indent=1)
    print(json.dumps(ab), flush=True)
    print("DONE fusion_ab", flush=True)


if __name__ == "__main__":
    main()
