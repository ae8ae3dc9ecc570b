"""Grover n=22 through iterated prefetch (VERDICT #5's done-criterion).

The whole Grover iterate (oracle + diffusion) compiles ONCE; all
iterations run as one device-side lax.scan dispatch
(engine.prefetch.iterate_program via Simulator.run_device_iterated) —
the TPU-scale analog of the reference's constant-table re-upload loop
(quantum_simulator_preproces_constant_only.cu:312-340) with zero
per-iteration compiles AND zero per-iteration dispatches.  The round-2
demo had to use the mxu engine (2.35 s); this records the prefetch
engine beating/matching it, plus the mxu number for the same build.

Usage: python scripts/grover22_demo.py [n] [cpu]
Writes bench_artifacts/grover22_demo.json.
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
from gpu_quantum_simulator_tpu.sampling import top_amplitudes_device

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")


def main() -> None:
    # 12 data + 10 ancilla = 22 total qubits, 50 iterations — the exact
    # round-2 demo geometry (docs/PERFORMANCE.md: 2.349 s via mxu)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    marked = 1234 % (1 << n)
    prefix, body, iters = models.grover_parts(n, marked=marked)
    out = {"data_qubits": n, "total_qubits": prefix.num_qubits,
           "marked": marked, "iterations": iters,
           "body_gates": len(body.gates)}

    for strategy in ("prefetch", "mxu"):
        sim = Simulator(SimulatorConfig(strategy=strategy))

        def run():
            re, im, _ = sim.run_device_iterated(body, iters, prefix=prefix)
            # top_amplitudes_device fetches to host — forces real
            # completion through the tunnel (block_until_ready can lie)
            probs, idx = top_amplitudes_device(re, im, 1)
            return int(idx[0]), float(probs[0])

        got, p_marked = run()  # warm-up: compile
        assert got == marked, (strategy, got, marked)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = statistics.median(times)
        out[strategy] = {"seconds": round(t, 4),
                         "p_marked": round(p_marked, 6)}
        print(json.dumps({strategy: out[strategy]}), flush=True)

    with open(os.path.join(ART, "grover22_demo.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
