"""Noisy trajectory-ensemble sampling on the real chip.

n=16 grover-profile circuit with a depolarizing noise layer on every
qubit each 50 gates; 1024 shots run as ONE batched ensemble (width
n + 10 = 26, ~0.5 GB f32 state) with fused collapse sampling of all 16
qubits at the end — only the (1024, 16) outcome bits leave the device.

Beyond-reference capability: the reference's measurement loop is disabled
dead code (quantum_simulator.c:68-73) and it has no noise story at all.

Writes bench_artifacts/noisy_demo.json.
Usage: python scripts/noisy_demo.py [n] [shots] [cpu]
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
from gpu_quantum_simulator_tpu.dynamic import DynamicCircuit, run_dynamic_batched

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")


def build(n: int, num_gates: int, noise_every: int, p: float) -> DynamicCircuit:
    base = models.grover_like(n, num_gates=num_gates, seed=7)
    dc = DynamicCircuit(n, num_clbits=n)
    for i, g in enumerate(base.gates):
        dc.items.append(g)
        if (i + 1) % noise_every == 0:
            for q in range(n):
                dc.noise("depolarizing", q, p)
    for q in range(n):
        dc.measure(q, q)
    return dc


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    shots = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    num_gates, noise_every, p = 400, 50, 0.002
    dc = build(n, num_gates, noise_every, p)

    def run():
        res = run_dynamic_batched(dc, shots=shots, seed=3)
        out = np.zeros(len(res), dtype=np.int64)
        for k, r in enumerate(res):
            idx = 0
            for q, bit in enumerate(r.clbits):
                idx |= bit << q
            out[k] = idx
        return out

    run()  # warm-up: compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        samples = run()
        times.append(time.perf_counter() - t0)

    uniq = len(np.unique(samples))
    out = {
        "n": n,
        "shots": shots,
        "ensemble_qubits": n + max(0, (shots - 1).bit_length()),
        "gates": num_gates,
        "noise_layers": num_gates // noise_every,
        "depolarizing_p": p,
        "seconds_median": round(statistics.median(times), 3),
        "unique_outcomes": uniq,
    }
    print(json.dumps(out), flush=True)
    assert uniq > 1  # noise + a generic circuit must spread outcomes
    with open(os.path.join(ART, "noisy_demo.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
