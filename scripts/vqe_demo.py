"""VQE demo: TFIM ground-state search with the jitted adjoint engine.

Primary path: run_vqe — the WHOLE optimization is one scanned device
program (N adam steps = one dispatch + one fetch; per-step tunnel RTTs
disappear).  Also times a short host-driven loop with the same compiled
f(theta) -> (<H>, grads) for the A/B.  Two device states resident:
n <= 28 on one v5e chip.  Usage: python scripts/vqe_demo.py [n] [layers]
[steps].  Writes bench_artifacts/vqe_demo.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build(n, layers):
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    terms = [(-1.0, f"Z{i} Z{i + 1}") for i in range(n - 1)]
    terms += [(-1.0, f"X{i}") for i in range(n)]
    c = Circuit(n)
    rng = np.random.default_rng(0)
    for _ in range(layers):
        for q in range(n):
            c.ry(rng.uniform(-0.3, 0.3), q)
        for q in range(n - 1):
            c.cx(q, q + 1)
    for q in range(n):
        c.ry(rng.uniform(-0.3, 0.3), q)
    return c, terms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    import optax
    from gpu_quantum_simulator_tpu.gradients import (
        make_adjoint_value_and_grad, run_vqe)

    c, terms = build(n, layers)

    # device-resident loop: compile + N steps in one program
    t0 = time.perf_counter()
    theta, energies = run_vqe(c, terms, steps=steps, learning_rate=0.05)
    total_s = time.perf_counter() - t0
    e0, e_final = float(energies[0]), float(energies[-1])
    num_params = theta.shape[0]

    # host-loop A/B with the same compiled step (10 steps, per-step fetch)
    fn, idxs, th = make_adjoint_value_and_grad(c, terms)
    fn(th)  # warm-up compile
    opt = optax.adam(0.05)
    state = opt.init(np.asarray(th))
    th = np.asarray(th)
    t1 = time.perf_counter()
    for _ in range(10):
        e, g = fn(th)
        upd, state = opt.update(np.asarray(g), state, th)
        th = np.asarray(optax.apply_updates(th, upd))
    host_step_ms = (time.perf_counter() - t1) / 10 * 1e3

    out = {
        "n": n, "layers": layers, "steps": steps,
        "num_params": num_params,
        "e_initial": e0, "e_final": e_final,
        "device_total_s": total_s,
        "device_step_ms_incl_compile": total_s / steps * 1e3,
        "host_loop_step_ms": host_step_ms,
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts", "vqe_demo.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
