"""VQE demo: TFIM ground-state search with the jitted adjoint engine.

One compiled f(theta) -> (<H>, all gradients) drives an optax.adam loop —
zero recompilation per step, two device states resident (n <= 28 on one
v5e chip).  Usage: python scripts/vqe_demo.py [n] [layers] [steps]
Writes bench_artifacts/vqe_demo.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    import optax
    from gpu_quantum_simulator_tpu.gradients import make_adjoint_value_and_grad
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

    t0 = time.perf_counter()
    fn, idxs, theta = make_adjoint_value_and_grad(c, terms)
    e, g = fn(theta)
    e0 = float(e)
    compile_s = time.perf_counter() - t0

    opt = optax.adam(0.05)
    state = opt.init(np.asarray(theta))
    theta = np.asarray(theta)
    t1 = time.perf_counter()
    energy = e0
    for k in range(steps):
        e, g = fn(theta)
        energy = float(e)
        upd, state = opt.update(np.asarray(g), state)
        theta = np.asarray(optax.apply_updates(theta, upd))
        if k % 10 == 0:
            print(f"step {k}: E = {energy:.6f}", flush=True)
    loop_s = time.perf_counter() - t1

    out = {
        "n": n, "layers": layers, "steps": steps,
        "num_params": len(idxs),
        "e_initial": e0, "e_final": energy,
        "compile_s": compile_s, "loop_s": loop_s,
        "step_ms": loop_s / steps * 1e3,
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts", "vqe_demo.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
