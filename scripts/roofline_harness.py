import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Per-op-class roofline measurement harness (docs/PERFORMANCE.md table).

Times each kernel class as jit(lax.scan(op, 128)) minus a trivial-dispatch
baseline on the real chip — the scan swamps the ~30 ms tunnel dispatch
latency.  Also runs the first n=29 demonstration (superseded by
scripts/n29_demo.py for the committed artifact).
"""
import time
import numpy as np
import jax, jax.numpy as jnp

print('backend:', jax.default_backend(), flush=True)

HBM_GBS = 819.0
MXU_F32_HIGHEST = 394.0e12 / 6
ITERS = 128  # on-device repetitions per dispatch: swamps the ~30 ms tunnel latency

_BASELINE = {}


def dispatch_baseline(n):
    """Median dispatch+fetch cost of a trivial jit on state-size arrays."""
    if n in _BASELINE:
        return _BASELINE[n]
    f = jax.jit(lambda re, im: (re, im))
    re, im = fresh(n)
    float(np.asarray(f(re, im)[0].ravel()[0]))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = f(re, im)
        float(np.asarray(out[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    _BASELINE[n] = float(np.median(ts))
    return _BASELINE[n]


def fresh(n):
    size = 1 << n
    return (jnp.zeros(size, jnp.float32).at[0].set(1.0),
            jnp.zeros(size, jnp.float32))


def timed_scanned(pure_fn, extra, n, reps=5):
    """Median of jit(scan(pure_fn, ITERS)) minus one-dispatch baseline."""
    @jax.jit
    def scanned(re, im, *xs):
        def body(c, _):
            return pure_fn(c[0], c[1], *xs), None
        (re, im), _ = jax.lax.scan(body, (re, im), None, length=ITERS)
        return re, im

    def force(out):
        # axon block_until_ready can lie (async); a scalar fetch cannot
        return float(np.asarray(out[0].ravel()[0]))

    re, im = fresh(n)
    force(scanned(re, im, *extra))
    ts = []
    for _ in range(reps):
        re, im = fresh(n)
        force((re, im))
        t0 = time.perf_counter()
        out = scanned(re, im, *extra)
        force(out)
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - dispatch_baseline(n), 1e-9)


def main():
    from gpu_quantum_simulator_tpu.engine.wide import WideProgram, LANES
    from gpu_quantum_simulator_tpu.ir.oplist import Op

    rng = np.random.default_rng(0)

    def rand_u(k):
        m = rng.standard_normal((1 << k, 1 << k)) + 1j * rng.standard_normal((1 << k, 1 << k))
        q, _ = np.linalg.qr(m)
        return q

    K = 16  # ops per program; per-dispatch work = ITERS * K ops
    results = {}
    for n in (20, 24):
        size = 1 << n
        pass_s = 2 * (size * 8) / (HBM_GBS * 1e9)
        print(f'--- n={n}: one state pass (rd+wr re+im) = {1e3*pass_s:.3f} ms', flush=True)

        for kh, qs in ((0, tuple(range(7))), (1, (0, 1, 2, 3, 4, 5, 7)),
                       (2, (0, 1, 2, 3, 4, 7, 8))):
            u = rand_u(7)
            ops = [Op('u', qs, u) for _ in range(K)]
            prog = WideProgram(ops, n, segment_ops=K)
            fn, mats = prog.pure_chain()
            t = timed_scanned(fn, mats, n)
            t_op = t / (ITERS * K)
            D = (1 << kh) * LANES
            mxu_s = 3 * 2 * (size // D) * D * D / MXU_F32_HIGHEST
            bound = max(pass_s * (1 if kh == 0 else 3), mxu_s)
            frac = 100 * bound / t_op
            results[(n, f'wide_kh{kh}')] = (t_op, bound)
            print(f'  wide kh={kh} (D={D}): {1e3*t_op:.4f} ms/op | bound '
                  f'{1e3*bound:.4f} (mxu {1e3*mxu_s:.4f}, pass {1e3*pass_s:.4f}) '
                  f'-> {frac:.0f}% of roofline', flush=True)

        # prefetch block kernel: one 16-mat block per application
        from gpu_quantum_simulator_tpu.engine.prefetch import (
            build_prefetch_program, DVIEW)
        u = rand_u(7)
        ops = [Op('u', tuple(range(7)), u) for _ in range(K)]
        prog = build_prefetch_program(ops, n, cap_steps=K + 8, cap_mats=K)
        (chain, scal, a_tab, b_tab) = prog._chain_parts[0]
        from gpu_quantum_simulator_tpu.engine.prefetch import perm_table
        ptab = perm_table(jnp.float32)
        t = timed_scanned(chain.pure, (scal, a_tab, b_tab, ptab), n)
        t_op = t / (ITERS * K)
        R2 = size >> 8
        mxu_s = 3 * 2 * R2 * DVIEW * DVIEW / MXU_F32_HIGHEST
        hbm_s = pass_s / K  # one pass per BLOCK of K ops
        bound = max(mxu_s, hbm_s)
        results[(n, 'prefetch_mat256')] = (t_op, bound)
        print(f'  prefetch mat256 (block of {K}): {1e3*t_op:.4f} ms/op | bound '
              f'{1e3*bound:.4f} (mxu {1e3*mxu_s:.4f}, pass/K {1e3*hbm_s:.4f}) '
              f'-> {100*bound/t_op:.0f}% of roofline', flush=True)

        # rowswap: pure copy pass (bit transposition at row granularity)
        bit = n - 9
        g = 1 << (n - 8 - bit)
        m = 1 << (bit - 1)

        def swap_pure(re, im):
            def one(x):
                t = x.reshape(g, 2, m, 2, 128)
                return jnp.swapaxes(t, 1, 3).reshape(-1)
            return one(re), one(im)

        t = timed_scanned(swap_pure, (), n)
        t_op = t / ITERS
        results[(n, 'rowswap')] = (t_op, pass_s)
        print(f'  rowswap(bit {bit}): {1e3*t_op:.4f} ms | copy bound '
              f'{1e3*pass_s:.4f} -> {100*pass_s/t_op:.0f}% of roofline', flush=True)

    # ---- n=29 demonstration ----
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.sampling import sample_state_device, norm_device

    n = 29
    c = models.grover_like(n, num_gates=2445, seed=29)
    sim = Simulator(SimulatorConfig(strategy='prefetch'))
    t0 = time.perf_counter()
    re, im, nops = sim.run_device(c)
    jax.block_until_ready(re)
    t1 = time.perf_counter()
    print(f'n=29 first run (incl compiles+H2D): {t1-t0:.1f}s items={nops}', flush=True)
    print(f'n=29 norm: {float(norm_device(re, im)):.8f}', flush=True)
    samples = np.asarray(sample_state_device(re, im, n, 1000, 0))
    print(f'n=29 sampling OK: {len(np.unique(samples))} unique outcomes in 1000 draws', flush=True)
    del re, im
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        re, im, _ = sim.run_device(c)
        jax.block_until_ready(re)
        ts.append(time.perf_counter() - t0)
        del re, im
    print(f'n=29 warm run_device median: {np.median(ts):.2f}s '
          f'(reference n=22 best: 51.68 s)', flush=True)
    print('DONE B3', flush=True)


main()
