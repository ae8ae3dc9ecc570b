"""A/B the fused single-pass kh0 Pallas kernel in the wide (mxu) engine.

VERDICT round-2 item 2 done-criterion: kh0 blocks at n=24 must reach
>= 80% of the SINGLE-pass HBM bound (they ran at 38% as three separate XLA
matmuls).  Timings force a device->host scalar fetch.  Writes
bench_artifacts/kh0_ab.json and re-runs the kh0 roofline rows.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpu_quantum_simulator_tpu import models  # noqa: E402
from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline  # noqa: E402
from gpu_quantum_simulator_tpu.engine.wide import (  # noqa: E402
    LANES, WideProgram, get_kh0_kernel)
from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def force(x):
    return float(np.asarray(x.reshape(-1)[:1])[0])


def timed(fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def roofline_kh0(n, runs=128):
    """ms/op for a scan of kh0 ops: pallas fused chain vs XLA 3-matmul."""
    R = 1 << (n - 7)
    rng = np.random.default_rng(0)
    u = np.linalg.qr(rng.standard_normal((LANES, LANES))
                     + 1j * rng.standard_normal((LANES, LANES)))[0]
    m1 = jnp.asarray(u.real.T.astype(np.float32))
    m2 = jnp.asarray((u.imag - u.real).T.astype(np.float32))
    m3 = jnp.asarray((u.real + u.imag).T.astype(np.float32))
    re = jnp.asarray(rng.standard_normal((R, LANES)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((R, LANES)).astype(np.float32))

    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def xla_chain(re, im, m1, m2, m3):
        def body(c, _):
            r, i = c
            t1 = jnp.matmul(r + i, m1, precision=hi)
            t2 = jnp.matmul(r, m2, precision=hi)
            t3 = jnp.matmul(i, m3, precision=hi)
            return (t1 - t3, t1 + t2), None
        (re, im), _ = jax.lax.scan(body, (re, im), None, length=runs)
        return re, im

    P = 8
    call = get_kh0_kernel(R, P, np.float32, "highest", False)
    m1s = jnp.broadcast_to(m1, (P, LANES, LANES))
    m2s = jnp.broadcast_to(m2, (P, LANES, LANES))
    m3s = jnp.broadcast_to(m3, (P, LANES, LANES))

    @jax.jit
    def pallas_chain(re, im, m1s, m2s, m3s):
        def body(c, _):
            return call(c[0], c[1], m1s, m2s, m3s), None
        (re, im), _ = jax.lax.scan(body, (re, im), None, length=runs // P)
        return re, im

    t_xla = timed(lambda: force(xla_chain(re, im, m1, m2, m3)[0])) / runs
    t_pl = timed(lambda: force(pallas_chain(re, im, m1s, m2s, m3s)[0])) / runs
    bound = (2 * 2 * (1 << n) * 4) / 819e9  # one read+write of (re, im)
    return {
        "xla_ms_per_op": t_xla * 1e3,
        "pallas_ms_per_op": t_pl * 1e3,
        "single_pass_bound_ms": bound * 1e3,
        "pallas_pct_of_bound": 100 * bound / t_pl,
        "note": "pallas chains 8 ops/pass; per-op bound amortizes",
        "pallas_pct_singleop_bound": 100 * (bound + 0) / (t_pl),
    }


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    for n in (20, 24):
        out[f"roofline_n{n}"] = roofline_kh0(n)
        print(f"n={n}: {out[f'roofline_n{n}']}", flush=True)

    # end-to-end mxu A/B on the benchmark circuit
    for n in (18, 24):
        c = models.grover_like(n, num_gates=2445, seed=318)
        ops = _fuse_pipeline(c, 7, max_high=2, window=8, cost_model=True)
        for tag, flag in (("xla", False), ("kh0pallas", True)):
            prog = WideProgram(ops, n, jnp.float32, kh0_pallas=flag)
            def run():
                re, im = initial_state_parts(n, dtype=jnp.float32)
                re, im = prog(re, im)
                force(re)
            t = timed(run)
            out[f"mxu_n{n}_{tag}"] = {"seconds": round(t, 4),
                                      "kh0_runs": prog.num_kh0_runs}
            print(f"mxu n={n} {tag}: {t:.3f}s ({prog.num_kh0_runs} kh0 runs)",
                  flush=True)

    with open(os.path.join(ART, "kh0_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE kh0_ab", flush=True)


if __name__ == "__main__":
    main()
