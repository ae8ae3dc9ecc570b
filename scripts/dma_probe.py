"""HBM bandwidth probe for the block-kernel streaming redesign (real TPU).

At n=24 the EMPTY block pass costs 1.325 ms (kernel_micro_n24.json) and
even the pure manual-DMA relayout pass 1.395 ms — both ~190-200 GB/s
against an 819 GB/s part, and suspiciously equal.  Before rebuilding the
block kernel around manual streaming DMA, map what actually limits each
path:

  xla_copy        jit elementwise pass (XLA's own streaming loop)
  grid2_T{T}      Mosaic-pipelined pallas copy, 2 x (R2,256) operands
  grid1_T512      same, ONE operand (stream-count scaling)
  grid4_T512      four (R2,128) operands (the in-place split layout)
  stream_T{T}_W{W} manual windowed double-buffer copy HBM->VMEM->HBM
                   (the streaming block kernel skeleton, no compute)
  hbm_direct      HBM->HBM block copies, no VMEM bounce (identity
                   relayout via engine.prefetch.get_relayout_kernel)

Usage: python scripts/dma_probe.py [n] [C]   (add 'interpret' for the
CPU correctness self-test of the manual stream kernel)
Writes bench_artifacts/dma_probe_n{n}.json with GB/s per variant.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

INTERPRET = "interpret" in sys.argv
if INTERPRET:
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["QSIM_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gpu_quantum_simulator_tpu.engine import prefetch as PF  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def grid_copy(n, T, nops, dt):
    """Mosaic auto-pipelined copy: nops operands of total 2^n * 8 bytes."""
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    # nops=1: one (R2,256) array; nops=2: re+im; nops=4: column halves
    width = PF.DVIEW if nops <= 2 else 2 * PF.DVIEW // nops
    spec = pl.BlockSpec((T, width), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)

    def kernel(scal_ref, *refs):
        ins, outs = refs[:nops], refs[nops:]
        for i, o in zip(ins, outs):
            o[:] = i[:]

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R2 // T,),
            in_specs=[spec] * nops,
            out_specs=[spec] * nops,
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, width), dt)] * nops,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=INTERPRET,
    )
    scal = jnp.zeros((1,), jnp.int32)
    return lambda *arrs: call(scal, *arrs)


def stream_copy(n, T, W, dt):
    """Manual windowed stream: HBM->VMEM (W slots) -> HBM, software
    pipelined so inputs run ~W-1 deep while outputs drain one behind."""
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    nt = R2 // T
    assert nt >= W >= 2

    def kernel(scal_ref, sre, sim, ore, oim, bre, bim, isem, osem):
        def in_d(t, s):
            return (pltpu.make_async_copy(sre.at[pl.ds(t * T, T), :],
                                          bre.at[s], isem.at[s, 0]),
                    pltpu.make_async_copy(sim.at[pl.ds(t * T, T), :],
                                          bim.at[s], isem.at[s, 1]))

        def out_d(t, s):
            return (pltpu.make_async_copy(bre.at[s],
                                          ore.at[pl.ds(t * T, T), :],
                                          osem.at[s, 0]),
                    pltpu.make_async_copy(bim.at[s],
                                          oim.at[pl.ds(t * T, T), :],
                                          osem.at[s, 1]))

        def pro(s, _):
            for d in in_d(s, s):
                d.start()
            return _

        jax.lax.fori_loop(0, W, pro, None, unroll=False)

        def body(t, _):
            s = jax.lax.rem(t, W)
            for d in in_d(t, s):
                d.wait()
            for d in out_d(t, s):
                d.start()
            nxt = t + W - 1            # refill the slot out(t-1) is freeing

            @pl.when((t >= 1) & (nxt < nt))
            def _():
                s2 = jax.lax.rem(nxt, W)
                for d in out_d(t - 1, s2):
                    d.wait()
                for d in in_d(nxt, s2):
                    d.start()
            return _

        jax.lax.fori_loop(0, nt, body, None, unroll=False)

        def drain(k, _):
            t = nt - W + k

            @pl.when(t >= 0)
            def _():
                for d in out_d(t, jax.lax.rem(t, W)):
                    d.wait()
            return _

        jax.lax.fori_loop(0, W, drain, None, unroll=False)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=[
                pltpu.VMEM((W, T, PF.DVIEW), dt),
                pltpu.VMEM((W, T, PF.DVIEW), dt),
                pltpu.SemaphoreType.DMA((W, 2)),
                pltpu.SemaphoreType.DMA((W, 2)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, PF.DVIEW), dt)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )
    scal = jnp.zeros((1,), jnp.int32)
    return lambda re, im: call(scal, re, im)


def hbm_direct(n, Tr, W, dt):
    """Direct HBM->HBM block copies (relayout pattern, identity map):
    separates block-size (issue-rate/latency) from window-depth effects."""
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    nblk = R2 // Tr

    def kernel(scal_ref, sre, sim, ore, oim, sems):
        def dmas(i, slot):
            return (pltpu.make_async_copy(sre.at[pl.ds(i * Tr, Tr), :],
                                          ore.at[pl.ds(i * Tr, Tr), :],
                                          sems.at[slot, 0]),
                    pltpu.make_async_copy(sim.at[pl.ds(i * Tr, Tr), :],
                                          oim.at[pl.ds(i * Tr, Tr), :],
                                          sems.at[slot, 1]))

        def body(i, _):
            slot = jax.lax.rem(i, W)

            @pl.when(i >= W)
            def _():
                for d in dmas(i - W, slot):
                    d.wait()

            for d in dmas(i, slot):
                d.start()
            return _

        jax.lax.fori_loop(0, nblk, body, None, unroll=False)

        def drain(k, _):
            i = nblk - W + k

            @pl.when(i >= 0)
            def _():
                for d in dmas(i, jax.lax.rem(i, W)):
                    d.wait()
            return _

        jax.lax.fori_loop(0, W, drain, None, unroll=False)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA((W, 2))],
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, PF.DVIEW), dt)] * 2,
        interpret=INTERPRET,
    )
    scal = jnp.zeros((1,), jnp.int32)
    return lambda re, im: call(scal, re, im)


def main():
    args = [a for a in sys.argv[1:] if a != "interpret"]
    n = int(args[0]) if args else (14 if INTERPRET else 24)
    C = int(args[1]) if len(args) > 1 else (2 if INTERPRET else 32)
    dt = np.float32
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((R2, PF.DVIEW)).astype(dt))
    im = jnp.asarray(rng.standard_normal((R2, PF.DVIEW)).astype(dt))

    if INTERPRET:
        out_r, out_i = stream_copy(n, min(512, R2 // 4), 4, dt)(re, im)
        np.testing.assert_array_equal(np.asarray(out_r), np.asarray(re))
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(im))
        g = grid_copy(n, min(512, R2), 2, dt)
        o2 = g(re, im)
        np.testing.assert_array_equal(np.asarray(o2[0]), np.asarray(re))
        h = hbm_direct(n, max(R2 // 8, 8), 4, dt)(re, im)
        np.testing.assert_array_equal(np.asarray(h[1]), np.asarray(im))
        print("interpret self-test OK")
        return

    pass_bytes = 2 * 2 * (1 << n) * 4          # read + write, re + im
    out = {"n": n, "C": C, "pass_GB": pass_bytes / 1e9,
           "hbm_bound_ms": pass_bytes / 819e9 * 1e3}

    def timed_scan(fn2, arrs, reps=3):
        """min over reps of jit(scan of C passes), per-pass ms."""
        def chain(*xs):
            def body(c, _):
                return tuple(fn2(*c)), None
            c, _ = jax.lax.scan(body, tuple(xs), None, length=C)
            return c

        j = jax.jit(chain)
        r = j(*arrs)
        np.asarray(r[0][:1, :1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = j(*arrs)
            np.asarray(r[0][:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / C * 1e3

    def record(label, ms, bytes_moved=pass_bytes):
        out[label + "_ms"] = ms
        out[label + "_GBps"] = bytes_moved / (ms / 1e3) / 1e9
        print(f"{label}: {ms:.3f} ms  {out[label + '_GBps']:.0f} GB/s",
              flush=True)

    eps = jnp.asarray(1e-12, dt)
    record("xla_copy", timed_scan(lambda r, i: (r + eps, i + eps), (re, im)))

    for T in (512, 2048, 8192):
        if T <= R2:
            record(f"grid2_T{T}", timed_scan(grid_copy(n, T, 2, dt), (re, im)))

    g1 = grid_copy(n, 512, 1, dt)
    record("grid1_T512",
           timed_scan(lambda r: (g1(r)[0],), (re,)), pass_bytes // 2)

    re0, re1 = re[:, :PF.LANES], re[:, PF.LANES:]
    im0, im1 = im[:, :PF.LANES], im[:, PF.LANES:]
    record("grid4_T512",
           timed_scan(grid_copy(n, 512, 4, dt), (re0, re1, im0, im1)))

    for T in (512, 2048):
        for W in (4, 8):
            if T * W <= R2:
                record(f"stream_T{T}_W{W}",
                       timed_scan(stream_copy(n, T, W, dt), (re, im)))

    for Tr in (64, 512, 4096):
        for W in (16, 32):
            if Tr <= R2 // W:
                record(f"hbmTr{Tr}_W{W}",
                       timed_scan(hbm_direct(n, Tr, W, dt), (re, im)))

    # XLA leading-dim block gather: the flat relayout as jnp.take —
    # if XLA streams this near-bandwidth the Pallas relayout is moot
    Tr = PF.relayout_rows(n)
    nblk = R2 // Tr
    idx = jnp.asarray(np.arange(nblk)[::-1].copy())

    def blockperm(r, i):
        f = lambda x: jnp.take(x.reshape(nblk, Tr * PF.DVIEW), idx,
                               axis=0).reshape(R2, PF.DVIEW)
        return f(r), f(i)

    record("xla_blockperm", timed_scan(blockperm, (re, im)))

    with open(os.path.join(ART, f"dma_probe_n{n}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
