"""Per-step-type microbenchmark of the prefetch block kernel (real TPU).

Isolates where the block kernel's time goes at a given n: empty pass
(pure state round-trip + dispatch), one mat step, one tswap (various k),
one perm, relayout pass, and full-capacity blocks — each timed as a
jit(lax.scan over C identical entries) so dispatch overhead amortizes.

Usage: python scripts/kernel_microbench.py [n] [C]
Writes bench_artifacts/kernel_micro_n{n}.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpu_quantum_simulator_tpu.engine import prefetch as PF  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)


def main():
    args = [a for a in sys.argv[1:] if a not in ("inplace", "stream")]
    inplace = "inplace" in sys.argv
    if "stream" in sys.argv:          # route plain blocks via manual DMA
        PF._STREAM_PLAIN = True
    n = int(args[0]) if args else 24
    C = int(args[1]) if len(args) > 1 else 64
    dt = np.float32
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    T = PF.tile_rows(n)
    logt = int(np.log2(T))
    import jax as _jax
    if inplace:
        chain = PF.get_block_chain_split(n, dt, "highest", False, C)
    else:
        chain = PF.get_block_chain(n, dt, "highest", False, C)
    runner = _jax.jit(chain.pure)
    cap_steps, cap_mats = PF.CAP_STEPS, PF.CAP_MATS
    ptab = PF.perm_table(dt)
    expander = PF._get_expander(C, cap_mats, dt)

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((R2 * PF.DVIEW,)).astype(dt))
    im = jnp.asarray(rng.standard_normal((R2 * PF.DVIEW,)).astype(dt))
    if inplace:
        re2 = np.asarray(re).reshape(R2, PF.DVIEW)
        im2 = np.asarray(im).reshape(R2, PF.DVIEW)
        parts = tuple(jnp.asarray(np.ascontiguousarray(h))
                      for h in (re2[:, :PF.LANES], re2[:, PF.LANES:],
                                im2[:, :PF.LANES], im2[:, PF.LANES:]))
        del re, im

    def make_tabs(nmats):
        u_re = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
        u_im = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
        mvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
        hvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
        for s in range(max(nmats, 1)):
            u = np.linalg.qr(rng.standard_normal((128, 128))
                             + 1j * rng.standard_normal((128, 128)))[0]
            u_re[:, s, :, :] = u.real
            u_im[:, s, :, :] = u.imag
            m, h = PF._window_vectors(tuple(range(7)))
            mvec[:, s] = m
            hvec[:, s] = h
        phases = np.zeros((C, cap_mats, 2, PF.UPAD), dt)
        mono = np.zeros((C, cap_mats), np.int32)
        return expander(jnp.asarray(u_re), jnp.asarray(u_im),
                        jnp.asarray(mvec), jnp.asarray(hvec),
                        jnp.asarray(mvec), jnp.asarray(hvec),
                        jnp.asarray(phases), jnp.asarray(mono))

    a_tab, b_tab = make_tabs(cap_mats)

    def make_mono_tabs():
        u_re = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
        u_im = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
        sig = rng.permutation(PF.UPAD)
        u_re[:, :, np.arange(PF.UPAD), sig] = 1.0
        mvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
        hvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
        m, h = PF._window_vectors(tuple(range(7)))
        mvec[:, :] = m
        hvec[:, :] = h
        theta = rng.uniform(0, 2 * np.pi, PF.UPAD).astype(dt)
        phases = np.zeros((C, cap_mats, 2, PF.UPAD), dt)
        phases[:, :, 0] = np.cos(theta)
        phases[:, :, 1] = np.sin(theta)
        mono = np.ones((C, cap_mats), np.int32)
        return expander(jnp.asarray(u_re), jnp.asarray(u_im),
                        jnp.asarray(mvec), jnp.asarray(hvec),
                        jnp.asarray(mvec), jnp.asarray(hvec),
                        jnp.asarray(phases), jnp.asarray(mono))

    mono_tabs = make_mono_tabs()

    def timed(scal_np, reps=3, tabs=None):
        scal = jnp.asarray(scal_np)
        at, bt = tabs if tabs is not None else (a_tab, b_tab)

        def once():
            if inplace:
                out = runner(*parts, scal, at, bt, ptab)
                np.asarray(out[0][:1, :1])
            else:
                r, i = runner(re, im, scal, at, bt, ptab)
                np.asarray(r[:1])

        once()   # compile+warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def scal_steps(kinds, midx, flag=0, s2=0, s3=0):
        scal = np.zeros((C, 4 + 2 * cap_steps), np.int32)
        scal[:, 0] = len(kinds)
        scal[:, 1] = flag
        scal[:, 2] = s2
        scal[:, 3] = s3
        scal[:, 4:4 + len(kinds)] = kinds
        scal[:, 4 + cap_steps:4 + cap_steps + len(midx)] = midx
        return scal

    out = {"n": n, "C": C, "T": T}
    base = timed(scal_steps([], []))
    out["empty_pass_ms"] = base / C * 1e3
    for label, kinds, midx in (
        ("mat1", [0], [0]),
        ("mat4", [0, 0, 0, 0], [0, 1, 2, 3]),
        ("mat12", [0] * 12, list(range(12))),
        ("perm1", [logt + 1], [3]),
        ("perm4", [logt + 1] * 4, [3, 1, 5, 3]),
        ("tswap_k1", [1], [0]),
        ("tswap_k4", [4], [0]),     # first static-roll stride
        ("tswap_k5", [5], [0]),
        (f"tswap_k{logt}", [logt], [0]),
        ("tswap4", [1, 5, logt, 3], [0, 0, 0, 0]),
    ):
        t = timed(scal_steps(kinds, midx))
        out[label + "_ms"] = t / C * 1e3
    for label, kinds, midx in (
        ("mono1", [logt + 2], [0]),
        ("mono4", [logt + 2] * 4, [0, 1, 2, 3]),
    ):
        t = timed(scal_steps(kinds, midx), tabs=mono_tabs)
        out[label + "_ms"] = t / C * 1e3
    sh = n - 9 - logt
    if inplace:
        # standalone pair-grid cross-tile swap entry
        t = timed(scal_steps([], [], flag=2, s3=sh))
        out["xswap_pairgrid_ms"] = t / C * 1e3
    else:
        # prologue xswap riding the input DMA
        t = timed(scal_steps([], [], flag=1, s2=1 << sh, s3=sh))
        out["xswap_prologue_ms"] = t / C * 1e3
    # relayout pass: swap the two top exposed row-block bits (a real
    # involution — identity sigma would find NO swap pairs in the in-place
    # form and measure an empty scan)
    if R2 > T:
        m = n - PF.LOCAL_QUBITS - int(np.log2(PF.relayout_rows(n)))
        sigma = np.arange(m)
        if m >= 2:
            sigma[m - 1], sigma[m - 2] = m - 2, m - 1
        scal = np.zeros((C, 4 + 2 * cap_steps), np.int32)
        scal[:, 1] = 3
        scal[:, 4:4 + m] = sigma
        t = timed(scal)
        out["relayout_ms"] = t / C * 1e3
    hbm_pass_ms = (2 * 2 * (1 << n) * 4) / 819e9 * 1e3
    out["hbm_roundtrip_bound_ms"] = hbm_pass_ms
    print(json.dumps(out, indent=1), flush=True)
    tag = f"kernel_micro_n{n}_inplace" if inplace else f"kernel_micro_n{n}"
    if PF._STREAM_PLAIN:
        tag += "_stream"
    with open(os.path.join(ART, tag + ".json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
