"""Gate-application primitives on split re/im state arrays (XLA path).

TPUs have no native complex arithmetic; like the reference's split
``vr``/``vi`` float arrays (quantum_simulator_naive.cu:148-149, SoA for
coalescing), the state is a pair of real arrays ``(re, im)`` and complex
algebra is written out explicitly.  That keeps the layout identical between
the XLA einsum path here and the Pallas kernels in ``ops/pallas_*``.

All qubit indices are STATIC Python ints: each function traces into a fixed
reshape + einsum that XLA tiles onto VPU/MXU.  Dynamic-target application
(for the recompile-free scan engine) lives in ``engine/scan.py``.

Index convention: qubit k = bit k of the flat index (little-endian), so a
flat state reshapes to (2^(n-1-k), 2, 2^k) with bit k as the middle axis —
the same bit-insertion pairing as the reference butterfly
(quantum_simulator_naive.cu:79-80), expressed as a shape instead of index math.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def initial_state_parts(num_qubits: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|0...0> as (re, im) float arrays (ref: init_state_vector,
    quantum_simulator_naive.cu:64-70)."""
    size = 1 << num_qubits
    re = jnp.zeros(size, dtype=dtype).at[0].set(1.0)
    im = jnp.zeros(size, dtype=dtype)
    return re, im


def split_state(v: np.ndarray, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.asarray(v.real, dtype=dtype), jnp.asarray(v.imag, dtype=dtype)


def join_state(re, im) -> np.ndarray:
    re = np.asarray(re)
    out_dtype = np.complex64 if re.dtype == np.float32 else np.complex128
    return (np.asarray(re) + 1j * np.asarray(im)).astype(out_dtype)


_PRECISION = "highest"  # TPU MXU defaults to bf16 passes; amplitudes need full f32


def _cmul_contract(eq: str, ur, ui, re, im):
    """Complex (ur+i·ui) contraction against (re+i·im) via 4 real einsums.

    XLA fuses these; a 3-multiplication Karatsuba variant saves ~25% MXU time
    for large fused blocks and is used in the mxu engine's Pallas kernels.
    precision='highest' forces full-f32 MXU passes — with the default bf16
    passes, amplitude error is ~1e-4/gate, far off the 1e-6 parity bar.
    """
    new_re = jnp.einsum(eq, ur, re, precision=_PRECISION) - jnp.einsum(
        eq, ui, im, precision=_PRECISION
    )
    new_im = jnp.einsum(eq, ur, im, precision=_PRECISION) + jnp.einsum(
        eq, ui, re, precision=_PRECISION
    )
    return new_re, new_im


def apply_1q(re, im, ur, ui, k: int, num_qubits: int):
    """Apply 2x2 gate (ur + i·ui) to qubit k. Shapes: state (2^n,), u (2,2)."""
    n = num_qubits
    hi, lo = 1 << (n - k - 1), 1 << k
    re3 = re.reshape(hi, 2, lo)
    im3 = im.reshape(hi, 2, lo)
    nre, nim = _cmul_contract("ab,xbz->xaz", ur, ui, re3, im3)
    return nre.reshape(-1), nim.reshape(-1)


def apply_2q(re, im, ur, ui, qa: int, qb: int, num_qubits: int):
    """Apply a 4x4 gate to the qubit pair; pair basis = bit(max)*2 + bit(min).

    (ur, ui) are (4, 4) real arrays in that basis — the layout produced by
    ir.gates.cnot_matrix / tensor_1q_pair, mirroring the reference's 4x4
    promotion (quantum_simulator_4x4.cu:189-233).
    """
    n = num_qubits
    a, b = (qa, qb) if qa < qb else (qb, qa)
    s_hi = 1 << (n - b - 1)
    s_mid = 1 << (b - a - 1)
    s_lo = 1 << a
    # axes: (hi, bit_b, mid, bit_a, lo)
    re5 = re.reshape(s_hi, 2, s_mid, 2, s_lo)
    im5 = im.reshape(s_hi, 2, s_mid, 2, s_lo)
    ur4 = ur.reshape(2, 2, 2, 2)  # [B_hi, B_lo, b_hi, b_lo]
    ui4 = ui.reshape(2, 2, 2, 2)
    nre, nim = _cmul_contract("ABab,xaybz->xAyBz", ur4, ui4, re5, im5)
    return nre.reshape(-1), nim.reshape(-1)


def apply_cnot(re, im, control: int, target: int, num_qubits: int):
    """Structural CNOT: flip the target axis on the control=1 half.

    Pure data movement — no flops, unlike the reference kernel which still
    streams all amplitudes (quantum_simulator_naive.cu:97-122).  XLA lowers
    the flip to a copy with reversed minor stride.
    """
    n = num_qubits
    c, t = control, target
    a, b = (c, t) if c < t else (t, c)
    s_hi = 1 << (n - b - 1)
    s_mid = 1 << (b - a - 1)
    s_lo = 1 << a
    c_axis, t_axis = (3, 1) if c < t else (1, 3)
    out = []
    for arr in (re, im):
        v5 = arr.reshape(s_hi, 2, s_mid, 2, s_lo)
        zero = jnp.take(v5, 0, axis=c_axis)  # control=0 slab (rank 4)
        one = jnp.take(v5, 1, axis=c_axis)   # control=1 slab
        # after dropping c_axis, the target axis shifts down if it was above
        flip_axis = t_axis if t_axis < c_axis else t_axis - 1
        flipped = jnp.flip(one, axis=flip_axis)
        stacked = jnp.stack([zero, flipped], axis=c_axis)
        out.append(stacked.reshape(-1))
    return out[0], out[1]


def unpermute_axes(perm) -> list:
    """Transpose axes that undo a qubit relabeling on a (2,)*n tensor.

    ``perm[q]`` = current bit position of original qubit q (see
    passes.permute.unpermute_state — this is its device-side twin).
    """
    n = len(perm)
    inv = np.argsort(perm)
    src_axis_of_orig = {int(inv[b]): n - 1 - b for b in range(n)}
    return [src_axis_of_orig[n - 1 - j] for j in range(n)]


def unpermute_device(re, im, perm):
    """Undo a qubit relabeling on-device.

    For small n this is one fused transpose.  For large n a rank-n tensor of
    2s is catastrophic — XLA pads the minor (2, 2) dims to (8, 128) tiles, a
    64x memory blow-up (16 GB for a 256 MB state at n=26) — so the
    permutation decomposes into bit transpositions, each executed in a
    low-rank, tile-friendly form:

      * row <-> row bit:   rank<=6 reshape/swapaxes (whole 512 B rows move)
      * lane <-> lane bit: one 128x128 permutation matmul (exact in f32)
      * lane <-> row bit:  rank-4 row shuffle + one 256x256 permutation matmul

    At most n transpositions -> <= n HBM passes, once per run.
    """
    n = len(perm)
    if n <= 14:  # 64x padding of a 2^14 array is 4 MB — the dense path is fine
        axes = unpermute_axes(perm)
        f = lambda x: x.reshape((2,) * n).transpose(axes).reshape(-1)
        return f(re), f(im)

    # position -> original qubit currently there (state given in relabeled
    # basis: original q sits at position perm[q])
    inv = np.argsort(np.asarray(perm))
    qubit_at = [int(inv[p]) for p in range(n)]
    pos_of = [int(p) for p in np.asarray(perm)]
    for q in range(n):
        p = pos_of[q]
        if p == q:
            continue
        re, im = _swap_bits_device(re, im, q, p, n)
        ql = qubit_at[q]
        qubit_at[q], qubit_at[p] = q, ql
        pos_of[q], pos_of[ql] = q, p
    return re, im


def _bitswap_perm_matrix(dim_bits: int, a: int, b: int, dtype=np.float32) -> np.ndarray:
    idx = np.arange(1 << dim_bits)
    ba, bb = (idx >> a) & 1, (idx >> b) & 1
    swapped = (idx & ~((1 << a) | (1 << b))) | (bb << a) | (ba << b)
    m = np.zeros((1 << dim_bits, 1 << dim_bits), dtype=dtype)
    m[swapped, idx] = 1.0
    return m


def _swap_bits_device(re, im, a: int, b: int, n: int):
    """Exchange bits a and b of the basis index (a < b) on (2^n,) arrays."""
    assert a < b
    R = 1 << (n - LANE_QUBITS)

    if a >= LANE_QUBITS:  # row <-> row
        rb1, rb2 = a - LANE_QUBITS, b - LANE_QUBITS
        g = R >> (rb2 + 1)
        m = 1 << (rb2 - rb1 - 1)
        s = 1 << rb1

        def f(x):
            t = x.reshape(g, 2, m, 2, s, LANES)
            return jnp.swapaxes(t, 1, 3).reshape(-1)

        return f(re), f(im)

    if b < LANE_QUBITS:  # lane <-> lane: 128x128 permutation matmul
        p128 = _bitswap_perm_matrix(LANE_QUBITS, a, b)

        def f(x):
            # 'highest' is required for exactness: a plain bf16 pass would
            # round the f32 amplitudes even against a 0/1 matrix
            return jnp.matmul(
                x.reshape(R, LANES), p128.T, precision=_PRECISION
            ).reshape(-1)

        return f(re), f(im)

    # mixed: bring row bit adjacent to lanes (rank-4 shuffle), swap via a
    # 256x256 permutation on (lane bit a) <-> (D bit 7), shuffle back
    rb = b - LANE_QUBITS
    g, s = R >> (rb + 1), 1 << rb
    p256 = _bitswap_perm_matrix(LANE_QUBITS + 1, a, LANE_QUBITS)

    def f(x):
        t = x.reshape(g, 2, s, LANES).transpose(0, 2, 1, 3).reshape(-1, 2 * LANES)
        t = jnp.matmul(t, p256.T, precision=_PRECISION)
        t = t.reshape(g, s, 2, LANES).transpose(0, 2, 1, 3)
        return t.reshape(-1)

    return f(re), f(im)


def apply_kq(re, im, ur, ui, qubits: Tuple[int, ...], num_qubits: int):
    """Apply a 2^k x 2^k fused block to k STATIC target qubits.

    ``qubits`` must be sorted ascending; matrix basis index is
    sum_j bit(qubits[j]) << j (little-endian over the sorted tuple) — the
    k-qubit generalization of the reference's 4x4 fusion, sized so k=7 fills
    a 128x128 MXU tile.
    """
    n = num_qubits
    k = len(qubits)
    assert tuple(sorted(qubits)) == tuple(qubits), "qubits must be sorted"
    dim = 1 << k
    assert ur.shape == (dim, dim)

    # Fast path: contiguous qubit run [a, a+k) — a pure reshape puts the block
    # basis on one axis; for a == 0 this is the MXU-shaped
    # (2^(n-k), 2^k) @ (2^k, 2^k)^T right-matmul the permute pass aims for.
    a = qubits[0]
    if tuple(qubits) == tuple(range(a, a + k)):
        hi, lo = 1 << (n - a - k), 1 << a
        re3 = re.reshape(hi, dim, lo)
        im3 = im.reshape(hi, dim, lo)
        nre, nim = _cmul_contract("AB,xBz->xAz", ur, ui, re3, im3)
        return nre.reshape(-1), nim.reshape(-1)

    # Lane-friendly path: if at most MAX_HIGH of the block's qubits sit above
    # the 7 lane bits, widen the matrix over (low 7 lane qubits) + (the high
    # qubits) and contract with a single MXU matmul.  The only data movement
    # is a ROW-axis transpose — whole 512-byte rows, which XLA copies at
    # bandwidth — never a bit-level lane transpose (those run ~100x below
    # bandwidth on TPU and were the reference-permute analog's real cost).
    high = [q for q in qubits if q >= LANE_QUBITS]
    if n > LANE_QUBITS and len(high) <= MAX_HIGH:
        return _apply_kq_wide(re, im, ur, ui, qubits, n)

    # Fallback: general bit transpose (slow; planner/fusion keep us off it).
    axes_of_bit = [n - 1 - bit for bit in range(n)]  # axis index for each bit
    tgt_axes = [axes_of_bit[q] for q in reversed(qubits)]  # MSB of block first
    rest_axes = [ax for ax in range(n) if ax not in tgt_axes]
    perm = tgt_axes + rest_axes

    def one(arr):
        t = arr.reshape((2,) * n).transpose(perm).reshape(dim, -1)
        return t

    re_m, im_m = one(re), one(im)
    mm = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
    nre = mm(ur, re_m) - mm(ui, im_m)
    nim = mm(ur, im_m) + mm(ui, re_m)

    inv = np.argsort(perm)

    def back(t):
        return t.reshape((2,) * n).transpose(inv).reshape(-1)

    return back(nre), back(nim)


LANE_QUBITS = 7   # low qubits living in the 128-lane dimension
LANES = 1 << LANE_QUBITS
MAX_HIGH = 3      # widen matrices over at most this many row qubits (D<=1024)


def _apply_kq_wide(re, im, ur, ui, qubits, n):
    """Block apply via row-transpose + one (R', D) @ (D, D) matmul.

    D = 2^(7+kh).  The matrix is expanded (host-side, numpy) over the 7 lane
    qubits plus the block's kh high qubits; the state's row axes are permuted
    so those kh bits sit adjacent to the lane dim, a pure row shuffle.
    """
    from ..ir.oplist import expand_unitary

    high = sorted(q for q in qubits if q >= LANE_QUBITS)
    kh = len(high)
    superset = tuple(range(LANE_QUBITS)) + tuple(high)
    # expand on host if inputs are numpy (megakernel bakes constants); the
    # jnp fallback works but wastes trace-time constant folding
    u = np.asarray(ur) + 1j * np.asarray(ui)
    big = expand_unitary(u.astype(np.complex128), qubits, superset)
    dt = np.dtype(np.asarray(ur).dtype)
    bre = np.ascontiguousarray(big.real, dtype=dt)
    bim = np.ascontiguousarray(big.imag, dtype=dt)

    nrow = n - LANE_QUBITS
    # row axes: axis j <-> row bit nrow-1-j <-> qubit 7 + (nrow-1-j)
    axis_of_qubit = {LANE_QUBITS + b: nrow - 1 - b for b in range(nrow)}
    h_axes = [axis_of_qubit[q] for q in reversed(high)]  # MSB of D-index first
    rest = [ax for ax in range(nrow) if ax not in h_axes]
    perm = rest + h_axes
    inv = np.argsort(perm)
    D = (1 << kh) * LANES
    shape_rows = (2,) * nrow

    def fwd(x):
        t = x.reshape(shape_rows + (LANES,)).transpose(perm + [nrow])
        return t.reshape(-1, D)

    def bwd(t):
        t = t.reshape(tuple(2 for _ in perm) + (LANES,))
        return t.transpose(list(inv) + [nrow]).reshape(-1)

    re_m, im_m = fwd(re), fwd(im)
    mm = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
    # right-multiply: out[r, :] = big @ v[r, :]  ->  v @ big^T
    nre = mm(re_m, bre.T) - mm(im_m, bim.T)
    nim = mm(im_m, bre.T) + mm(re_m, bim.T)
    return bwd(nre), bwd(nim)
