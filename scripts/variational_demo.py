"""Variational / time-evolution workloads through iterated execution.

Runs at n=24 on the real chip (override with argv[1]):
  * QAOA MaxCut on the ring, p=8 uniform-angle layers — the body block
    compiles ONCE and iterates device-side (run_device_iterated); <C> is
    computed from device-resident Z-string expectations (no state fetch).
  * First-order Trotter TFIM quench, 100 steps — same mechanism.

The reference's analogous pattern is the constant-table re-upload loop
(quantum_simulator_preproces_constant_only.cu:312-340) which re-uploads
gate tables per segment; here the iteration block is one executable and
the repetition count is a device-side loop.

Writes bench_artifacts/variational_demo.json.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" in sys.argv:  # local smoke-testing without the tunnel
    sys.argv.remove("cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["QSIM_NO_COMPILE_CACHE"] = "1"

import numpy as np

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.models.circuits import ring_edges
from gpu_quantum_simulator_tpu.sampling import expectation_z

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")


def timed(fn, runs=3):
    fn()  # warm-up: compile
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    strategy = sys.argv[2] if len(sys.argv) > 2 else "prefetch"
    sim = Simulator(SimulatorConfig(strategy=strategy))
    out = {"n": n, "strategy": strategy}

    # --- QAOA MaxCut, ring graph, p = 8 uniform layers ---
    layers = 8
    prefix, body, _ = models.qaoa_maxcut_parts(n, gamma=0.7, beta=0.4,
                                               layers=layers)

    def qaoa():
        re, im, _ = sim.run_device_iterated(body, layers, prefix=prefix)
        edges = ring_edges(n)
        zz = sum(expectation_z(re, im, [a, b], n) for a, b in edges)
        return 0.5 * len(edges) - 0.5 * zz  # <C>

    secs, cost = timed(qaoa)
    out["qaoa"] = {
        "layers": layers,
        "body_gates": len(body.gates),
        "total_gates": len(prefix.gates) + layers * len(body.gates),
        "seconds_median": round(secs, 3),
        "maxcut_expectation": round(cost, 4),
        "plus_state_baseline": 0.5 * len(ring_edges(n)),
    }
    print(json.dumps(out["qaoa"]), flush=True)
    assert cost > 0.5 * len(ring_edges(n)), "QAOA must beat the |+> baseline"

    # --- Trotter TFIM quench, 100 steps ---
    steps, dt = 100, 0.02
    prefix, body, _ = models.trotter_tfim_parts(n, dt=dt, J=1.0, g=0.9,
                                                steps=steps)

    def tfim():
        re, im, _ = sim.run_device_iterated(body, steps, prefix=prefix)
        mag = sum(expectation_z(re, im, [q], n) for q in range(0, n, max(1, n // 8)))
        norm2 = float(np.asarray((re * re + im * im).sum()))
        return mag, norm2

    secs, (mag, norm2) = timed(tfim)
    out["tfim"] = {
        "steps": steps,
        "dt": dt,
        "body_gates": len(body.gates),
        "total_gates": steps * len(body.gates),
        "seconds_median": round(secs, 3),
        "sampled_site_magnetization_sum": round(mag, 4),
        "norm": round(norm2, 7),
    }
    print(json.dumps(out["tfim"]), flush=True)
    assert abs(norm2 - 1.0) < 1e-3

    with open(os.path.join(ART, "variational_demo.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "variational_demo.json"}), flush=True)


if __name__ == "__main__":
    main()
