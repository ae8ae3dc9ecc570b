"""Mat-step form A/B on the real chip (round-4 verdict #3).

The prefetch 256-mat class runs at 40-44% of its modeled MXU bound
(docs/PERFORMANCE.md roofline) — the suspected culprit is the Karatsuba
3-dot dependency chain + VPU operand combines, not MXU throughput.  This
measures the three QSIM_MAT_KERNEL forms (karatsuba | schoolbook | block,
engine/prefetch._make_mat_step) on mat1/mat4/mat12 scan blocks, flat and
in-place, at the shipping precision rung ("high" for n >= 24,
config.resolve precision ladder) plus "highest" flat for the roofline
table.  Everything is timed as jit(scan over C identical entries) with a
forced scalar fetch, min of reps — same protocol as kernel_microbench.py.

Usage: python scripts/matform_ab.py [n] [C]
Writes bench_artifacts/matform_ab_n{n}.json
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

FORMS = ("karatsuba", "schoolbook", "block")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dt = np.float32
    R2 = 1 << (n - PF.LOCAL_QUBITS)
    cap_steps, cap_mats = PF.CAP_STEPS, PF.CAP_MATS
    ptab = PF.perm_table(dt)
    expander = PF._get_expander(C, cap_mats, dt)
    rng = np.random.default_rng(0)

    re = jnp.asarray(rng.standard_normal((R2 * PF.DVIEW,)).astype(dt))
    im = jnp.asarray(rng.standard_normal((R2 * PF.DVIEW,)).astype(dt))
    re2 = np.asarray(re).reshape(R2, PF.DVIEW)
    im2 = np.asarray(im).reshape(R2, PF.DVIEW)
    parts = tuple(jnp.asarray(np.ascontiguousarray(h))
                  for h in (re2[:, :PF.LANES], re2[:, PF.LANES:],
                            im2[:, :PF.LANES], im2[:, PF.LANES:]))

    u_re = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
    u_im = np.zeros((C, cap_mats, PF.UPAD, PF.UPAD), dt)
    mvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
    hvec = np.zeros((C, cap_mats, PF.DVIEW), np.int32)
    for s in range(cap_mats):
        u = np.linalg.qr(rng.standard_normal((128, 128))
                         + 1j * rng.standard_normal((128, 128)))[0]
        u_re[:, s] = u.real
        u_im[:, s] = u.imag
        m, h = PF._window_vectors(tuple(range(7)))
        mvec[:, s] = m
        hvec[:, s] = h
    phases = np.zeros((C, cap_mats, 2, PF.UPAD), dt)
    mono = np.zeros((C, cap_mats), np.int32)
    a_tab, b_tab = expander(jnp.asarray(u_re), jnp.asarray(u_im),
                            jnp.asarray(mvec), jnp.asarray(hvec),
                            jnp.asarray(mvec), jnp.asarray(hvec),
                            jnp.asarray(phases), jnp.asarray(mono))

    def scal_steps(kinds, midx):
        scal = np.zeros((C, 4 + 2 * cap_steps), np.int32)
        scal[:, 0] = len(kinds)
        scal[:, 4:4 + len(kinds)] = kinds
        scal[:, 4 + cap_steps:4 + cap_steps + len(midx)] = midx
        return jnp.asarray(scal)

    def bench(form, precision, inplace, reps=3):
        os.environ["QSIM_MAT_KERNEL"] = form
        if inplace:
            chain = PF.get_block_chain_split(n, dt, precision, False, C)
        else:
            chain = PF.get_block_chain(n, dt, precision, False, C)
        runner = jax.jit(chain.pure)

        def timed(scal):
            def once():
                if inplace:
                    out = runner(*parts, scal, a_tab, b_tab, ptab)
                    np.asarray(out[0][:1, :1])
                else:
                    r, i = runner(re, im, scal, a_tab, b_tab, ptab)
                    np.asarray(r[:1])

            once()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                once()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        row = {}
        base = timed(scal_steps([], []))
        row["empty_pass_ms"] = base / C * 1e3
        for label, k in (("mat1", 1), ("mat4", 4), ("mat12", 12)):
            t = timed(scal_steps([0] * k, list(range(k))))
            row[label + "_ms"] = t / C * 1e3
            row[label + "_per_op_ms"] = (t - base) / C / k * 1e3
        print(f"{form:10s} prec={precision:7s} inplace={int(inplace)}: "
              + " ".join(f"{lbl}={row[lbl + '_per_op_ms']:.4f}"
                         for lbl in ("mat1", "mat4", "mat12")), flush=True)
        return row

    path = os.path.join(ART, f"matform_ab_n{n}.json")
    out = {"n": n, "C": C, "T": PF.tile_rows(n), "rows": {}}

    def save():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    only = os.environ.get("QSIM_MATFORM_ONLY", "")  # e.g. "karatsuba/high"
    cases = ([(form, "high", False) for form in FORMS]
             + [(form, "high", True) for form in FORMS]
             + [(form, "highest", False) for form in FORMS])
    if only:
        cases = [c for c in cases if f"{c[0]}/{c[1]}" in only.split(",")]
    for form, precision, inplace in cases:
        key = f"{form}/{precision}/{'inplace' if inplace else 'flat'}"
        out["rows"][key] = bench(form, precision, inplace)
        save()
    print("DONE matform_ab", flush=True)


if __name__ == "__main__":
    main()
