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
from ..ops.apply import _PRECISION

LANE_QUBITS = 7
LANES = 1 << LANE_QUBITS


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

    nrow = n - LANE_QUBITS
    axis_of_qubit = {LANE_QUBITS + b: nrow - 1 - b for b in range(nrow)}
    h_axes = [axis_of_qubit[q] for q in reversed(high)]
    rest = [ax for ax in range(nrow) if ax not in h_axes]
    perm = rest + h_axes
    inv = list(np.argsort(perm))
    D = (1 << kh) * LANES
    return kh, perm, inv, D, big.real, big.imag


def _apply_wide(re, im, bre, bim, perm, inv, D, nrow):
    """One block: rows-shuffle, right-matmul, inverse shuffle (traced)."""
    identity_perm = perm == list(range(nrow))
    shape_rows = (2,) * nrow

    def fwd(x):
        if identity_perm:
            return x.reshape(-1, D)
        t = x.reshape(shape_rows + (LANES,)).transpose(perm + [nrow])
        return t.reshape(-1, D)

    def bwd(t):
        if identity_perm:
            return t.reshape(-1, LANES)
        t = t.reshape(tuple(2 for _ in perm) + (LANES,))
        return t.transpose(inv + [nrow]).reshape(-1, LANES)

    re_m, im_m = fwd(re), fwd(im)
    mm = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
    bret, bimt = bre.T, bim.T
    nre = mm(re_m, bret) - mm(im_m, bimt)
    nim = mm(im_m, bret) + mm(re_m, bimt)
    return bwd(nre), bwd(nim)


# Ops per compiled segment: one monolithic program for deep circuits
# exhausts the (remote) compiler's memory at large n, so the op stream is
# split into independently-jitted segments chained on-device — the same
# shape as the reference's <=1927-op constant-memory rounds
# (quantum_simulator_preproces_constant_only.cu:312-340).
SEGMENT_OPS = 128


class WideProgram:
    """A compiled wide-matmul circuit program + its device-resident tables."""

    def __init__(self, ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32,
                 segment_ops: int = SEGMENT_OPS):
        n = num_qubits
        assert n > LANE_QUBITS
        self.num_qubits = n
        nrow = n - LANE_QUBITS
        dt = np.dtype(real_dtype)

        specs = [_op_spec(op, n) for op in ops]
        self._segments = []
        for s0 in range(0, max(len(specs), 1), segment_ops):
            seg = specs[s0 : s0 + segment_ops]
            by_d: Dict[int, list] = {}
            steps = []
            for kh, perm, inv, D, bre, bim in seg:
                bucket = by_d.setdefault(D, [])
                steps.append((D, len(bucket), tuple(perm), tuple(inv)))
                bucket.append((bre, bim))
            d_order = sorted(by_d)
            mats = []
            for D in d_order:
                mats.append(jnp.asarray(np.stack([m[0] for m in by_d[D]]).astype(dt)))
                mats.append(jnp.asarray(np.stack([m[1] for m in by_d[D]]).astype(dt)))

            def make_kernel(steps=steps, d_order=d_order):
                def kernel(re, im, *mat_args):
                    lut = {
                        D: (mat_args[2 * i], mat_args[2 * i + 1])
                        for i, D in enumerate(d_order)
                    }
                    re = re.reshape(-1, LANES)
                    im = im.reshape(-1, LANES)
                    for D, idx, perm, inv in steps:
                        bre, bim = lut[D]
                        re, im = _apply_wide(
                            re, im, bre[idx], bim[idx], list(perm), list(inv), D, nrow
                        )
                    return re.reshape(-1), im.reshape(-1)

                return kernel

            self._segments.append((jax.jit(make_kernel()), mats))

    def __call__(self, re, im):
        for fn, mats in self._segments:
            re, im = fn(re, im, *mats)
        return re, im


_CACHE: dict = {}
_CACHE_LIMIT = 16


def build_wide_program(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32):
    h = hashlib.sha256(f"{num_qubits}|{real_dtype}".encode())
    for op in ops:
        h.update(op.kind.encode())
        h.update(np.asarray(op.qubits, dtype=np.int64).tobytes())
        if op.u is not None:
            h.update(np.ascontiguousarray(op.u).tobytes())
    key = h.hexdigest()
    prog = _CACHE.get(key)
    if prog is None:
        prog = WideProgram(ops, num_qubits, real_dtype)
        if len(_CACHE) >= _CACHE_LIMIT:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = prog
    return prog
