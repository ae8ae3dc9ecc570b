"""Wide-matmul megakernel: every fused block is one MXU contraction.

The whole-circuit program for n > 7 qubits.  State layout: (R, 128) float32
pair with the low 7 qubits on the lane dimension.  A block over qubits
L ∪ H (L ⊆ [0,7), H = kh high qubits, kh <= 2 via fuse_k's max_high) is
expanded host-side over the superset (lane qubits + H) into a D x D matrix,
D = 2^(7+kh) <= 512, and applied as

    rows-shuffle  →  (R', D) @ (D, D)^T  →  inverse rows-shuffle

The row shuffle moves whole 512-byte rows (XLA copies these at HBM
bandwidth); no op ever performs a bit-level lane transpose — profiling shows
those run ~100x below bandwidth on TPU and they were the dominant cost of
the naive transpose formulation.

Matrices are passed as RUNTIME inputs (stacked per D), not baked constants:
the executable stays small, H2D happens once per circuit, and re-runs hit
the jit cache.  This is the reference's constant-memory gate-table idea
(quantum_simulator_preproces_constant.cu:448-451) at TPU scale — no 1927-op
budget, matrices up to 512x512 instead of 34 bytes.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.oplist import Op, expand_unitary

LANE_QUBITS = 7
LANES = 1 << LANE_QUBITS

KH0_TILE_ROWS = 512     # state rows per grid step of the fused kh0 kernel
KH0_BATCH = 8           # max consecutive kh0 blocks fused into one pass

_KH0_CACHE: dict = {}


def get_kh0_kernel(R: int, nmats: int, real_dtype, precision: str,
                   interpret: bool):
    """Fused single-pass complex matmul chain for kh=0 (D=128) blocks.

    The XLA path runs the Karatsuba complex product as three separate real
    matmuls, so at HBM-bound sizes the state streams through HBM ~3x per
    op (measured 38% of the single-pass bound at n=24,
    docs/PERFORMANCE.md).  This kernel reads each (T, 128) state tile into
    VMEM ONCE, forms all three products on-core, and chains up to
    ``nmats`` consecutive kh0 blocks while the tile is resident — traffic
    amortizes to one read+write per RUN of ops, not per op.

    Returns f(re, im, m1, m2, m3) on (R, 128) state components with
    (nmats, 128, 128) stacked Karatsuba combinations (same convention as
    _apply_wide_karatsuba; pad short runs with (I, -I, I) identities).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = np.dtype(real_dtype)
    T = min(KH0_TILE_ROWS, R)
    key = (R, nmats, dt.str, precision, interpret)
    fn = _KH0_CACHE.get(key)
    if fn is not None:
        return fn
    if precision == "high":
        # Mosaic lowers only DEFAULT and HIGHEST dots ("Unsupported dot
        # precision: HIGH"); emulate XLA's 3-pass bf16 decomposition by
        # hand, exactly like engine.prefetch._make_dot — each pass is a
        # DEFAULT dot whose operands are bf16-exact or the bf16 residual.
        _d = lambda a, b: jnp.dot(a, b, preferred_element_type=dt,
                                  precision=jax.lax.Precision.DEFAULT)

        def _dot(x, m):
            # bf16-NATIVE operands with f32 accumulation (round-5 matform
            # A/B: per-pass f32->bf16 re-conversion was real time)
            xh = x.astype(jnp.bfloat16)
            mh = m.astype(jnp.bfloat16)
            xl = (x - xh.astype(dt)).astype(jnp.bfloat16)
            ml = (m - mh.astype(dt)).astype(jnp.bfloat16)
            return _d(xh, mh) + _d(xl, mh) + _d(xh, ml)
    else:
        prec = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[precision]
        _dot = lambda x, m: jnp.dot(x, m, preferred_element_type=dt,
                                    precision=prec)

    def kernel(re_ref, im_ref, m1_ref, m2_ref, m3_ref, ore_ref, oim_ref):
        dot = _dot

        def step(j, carry):
            r, i = carry
            t1 = dot(r + i, m1_ref[j])
            t2 = dot(r, m2_ref[j])
            t3 = dot(i, m3_ref[j])
            return t1 - t3, t1 + t2

        r, i = jax.lax.fori_loop(0, nmats, step, (re_ref[:], im_ref[:]))
        ore_ref[:] = r
        oim_ref[:] = i

    state = pl.BlockSpec((T, LANES), lambda g: (g, 0))
    tab = pl.BlockSpec((nmats, LANES, LANES), lambda g: (0, 0, 0))
    call = pl.pallas_call(
        kernel,
        grid=(R // T,),
        in_specs=[state, state, tab, tab, tab],
        out_specs=[state, state],
        out_shape=[jax.ShapeDtypeStruct((R, LANES), dt)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * R * LANES * LANES * nmats,
            bytes_accessed=dt.itemsize * (4 * R * LANES
                                          + 3 * nmats * LANES * LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    _KH0_CACHE[key] = call
    return call


def _op_spec(op: Op, n: int):
    """(kh, perm, inv, D, big_re, big_im) for one fused block."""
    if op.kind == "cx":
        from ..ir.oplist import op_matrix

        u, qs = op_matrix(op)
    else:
        u, qs = op.u, op.qubits
    high = sorted(q for q in qs if q >= LANE_QUBITS)
    kh = len(high)
    superset = tuple(range(min(LANE_QUBITS, n))) + tuple(high)
    big = expand_unitary(np.asarray(u, dtype=np.complex128), qs, superset)

    row_bits = tuple(q - LANE_QUBITS for q in high)  # ascending
    D = (1 << kh) * LANES
    return kh, row_bits, D, big.real, big.imag


def row_shuffles(row_bits, R):
    """(fwd, bwd) moving the given row bits adjacent to the lane dim.

    Low-rank forms (rank <= 6) — a generic (2,)*nrow transpose is rank-18 at
    n=24 and blows up both XLA compile memory and runtime.  fwd flattens to
    (-1, D); bwd restores (R, LANES).  D-index bit 7+j <-> row_bits[j]
    (ascending), matching _op_spec's superset ordering.
    """
    kh = len(row_bits)
    if kh == 0:
        return (lambda x: x.reshape(-1, LANES)), (lambda t: t.reshape(R, LANES))
    if kh == 1:
        b1 = row_bits[0]
        g, st = R >> (b1 + 1), 1 << b1

        def fwd(x):
            t = x.reshape(g, 2, st, LANES).transpose(0, 2, 1, 3)
            return t.reshape(-1, 2 * LANES)

        def bwd(t):
            t = t.reshape(g, st, 2, LANES).transpose(0, 2, 1, 3)
            return t.reshape(R, LANES)

        return fwd, bwd
    b1, b2 = row_bits
    g = R >> (b2 + 1)
    m = 1 << (b2 - b1 - 1)
    st = 1 << b1

    def fwd2(x):
        t = x.reshape(g, 2, m, 2, st, LANES).transpose(0, 2, 4, 1, 3, 5)
        return t.reshape(-1, 4 * LANES)

    def bwd2(t):
        t = t.reshape(g, m, st, 2, 2, LANES).transpose(0, 3, 1, 4, 2, 5)
        return t.reshape(R, LANES)

    return fwd2, bwd2


def _apply_wide_karatsuba(re, im, m1, m2, m3, row_bits, D, R, precision):
    """One block: rows-shuffle, 3-matmul complex right-multiply, inverse.

    m1/m2/m3 are the host-precomputed (already transposed) Karatsuba
    combinations  m1 = M_re^T,  m2 = (M_im - M_re)^T,  m3 = (M_re + M_im)^T,
    giving  out = v @ M^T  with 3 MXU matmuls instead of 4:
        t1 = (v_re + v_im) @ m1;  t2 = v_re @ m2;  t3 = v_im @ m3
        out_re = t1 - t3;         out_im = t1 + t2
    """
    fwd, bwd = row_shuffles(row_bits, R)
    re_m, im_m = fwd(re), fwd(im)
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)
    t1 = mm(re_m + im_m, m1)
    t2 = mm(re_m, m2)
    t3 = mm(im_m, m3)
    return bwd(t1 - t3), bwd(t1 + t2)


# Ops per compiled segment: one monolithic program for deep circuits
# exhausts the (remote) compiler's memory at large n, so the op stream is
# split into independently-jitted segments chained on-device — the same
# shape as the reference's <=1927-op constant-memory rounds
# (quantum_simulator_preproces_constant_only.cu:312-340).
SEGMENT_OPS = 128


class WideProgram:
    """A compiled wide-matmul circuit program + its device-resident tables."""

    def __init__(self, ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32,
                 segment_ops: int = SEGMENT_OPS, precision: str = "highest",
                 kh0_pallas=None):
        n = num_qubits
        assert n > LANE_QUBITS
        self.num_qubits = n
        R = 1 << (n - LANE_QUBITS)
        dt = np.dtype(real_dtype)
        interpret = jax.default_backend() != "tpu"
        if kh0_pallas is None:
            # the fused single-pass kernel: TPU + float32 + a state big
            # enough to tile; measured ~38% -> single-pass-bound at n=24
            kh0_pallas = (not interpret and dt == np.dtype(np.float32)
                          and R >= 8)
        self.kh0_pallas = bool(kh0_pallas)

        specs = [_op_spec(op, n) for op in ops]
        self._segments = []
        self.num_kh0_runs = 0
        ident = np.eye(LANES)
        id_combo = (ident, -ident, ident)  # (I, -I, I): out = v (identity op)
        for s0 in range(0, max(len(specs), 1), segment_ops):
            seg = specs[s0 : s0 + segment_ops]
            by_d: Dict[int, list] = {}
            steps = []
            runs: List[list] = []
            pending: List[tuple] = []

            def flush_run():
                if not pending:
                    return
                L = len(pending)
                P = 1 << (L - 1).bit_length()  # pad: few kernel variants
                run = list(pending) + [id_combo] * (P - L)
                steps.append(("kh0", len(runs), P))
                runs.append(run)
                pending.clear()
                self.num_kh0_runs += 1

            for kh, row_bits, D, bre, bim in seg:
                combo = (
                    np.ascontiguousarray(bre.T),
                    np.ascontiguousarray((bim - bre).T),
                    np.ascontiguousarray((bre + bim).T),
                )
                if self.kh0_pallas and kh == 0:
                    # consecutive kh0 blocks chain inside ONE state pass
                    pending.append(combo)
                    if len(pending) == KH0_BATCH:
                        flush_run()
                    continue
                flush_run()
                bucket = by_d.setdefault(D, [])
                steps.append(("mm", D, len(bucket), tuple(row_bits)))
                bucket.append(combo)
            flush_run()

            d_order = sorted(by_d)
            mats = []
            for D in d_order:
                for c in range(3):
                    mats.append(
                        jnp.asarray(np.stack([m[c] for m in by_d[D]]).astype(dt))
                    )
            run_offsets = []
            for run in runs:
                run_offsets.append(len(mats))
                for c in range(3):
                    mats.append(
                        jnp.asarray(np.stack([m[c] for m in run]).astype(dt))
                    )

            def make_kernel(steps=steps, d_order=d_order,
                            run_offsets=run_offsets):
                def kernel(re, im, *mat_args):
                    lut = {
                        D: (mat_args[3 * i], mat_args[3 * i + 1], mat_args[3 * i + 2])
                        for i, D in enumerate(d_order)
                    }
                    re = re.reshape(R, LANES)
                    im = im.reshape(R, LANES)
                    for st in steps:
                        if st[0] == "kh0":
                            _, ridx, P = st
                            off = run_offsets[ridx]
                            call = get_kh0_kernel(R, P, dt, precision,
                                                  interpret)
                            re, im = call(re, im, mat_args[off],
                                          mat_args[off + 1], mat_args[off + 2])
                        else:
                            _, D, idx, row_bits = st
                            m1, m2, m3 = lut[D]
                            re, im = _apply_wide_karatsuba(
                                re, im, m1[idx], m2[idx], m3[idx],
                                row_bits, D, R, precision,
                            )
                    return re.reshape(-1), im.reshape(-1)

                return kernel

            # donate the state pair: XLA reuses the buffers across the
            # segment chain, halving live HBM (decisive at n >= 28)
            kern = make_kernel()
            self._raw_segments = getattr(self, "_raw_segments", [])
            self._raw_segments.append((kern, mats))
            self._segments.append((jax.jit(kern, donate_argnums=(0, 1)), mats))

    def __call__(self, re, im):
        for fn, mats in self._segments:
            re, im = fn(re, im, *mats)
        return re, im

    def pure_chain(self):
        """(unjitted fn(re, im, *all_mats), flat mats list) applying every
        segment — for embedding the whole program in lax.scan/other traces.
        Intended for modest op counts (e.g. one algorithm iteration)."""
        kernels = [k for k, _ in self._raw_segments]
        counts = [len(m) for _, m in self._raw_segments]
        flat = [a for _, m in self._raw_segments for a in m]

        def fn(re, im, *mats):
            i = 0
            for kern, cnt in zip(kernels, counts):
                re, im = kern(re, im, *mats[i : i + cnt])
                i += cnt
            return re, im

        return fn, flat


_CACHE: dict = {}
_CACHE_LIMIT = 16


def build_wide_program(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32,
                       precision: str = "highest", kh0_pallas=None):
    h = hashlib.sha256(
        f"{num_qubits}|{real_dtype}|{precision}|{kh0_pallas}"
        f"|{jax.default_backend()}".encode())
    for op in ops:
        h.update(op.kind.encode())
        h.update(np.asarray(op.qubits, dtype=np.int64).tobytes())
        if op.u is not None:
            h.update(np.ascontiguousarray(op.u).tobytes())
    key = h.hexdigest()
    prog = _CACHE.get(key)
    if prog is None:
        prog = WideProgram(ops, num_qubits, real_dtype, precision=precision,
                           kh0_pallas=kh0_pallas)
        if len(_CACHE) >= _CACHE_LIMIT:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = prog
    return prog
