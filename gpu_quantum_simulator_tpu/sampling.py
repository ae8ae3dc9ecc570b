"""Measurement sampling — on-device, no full-state transfer.

The reference computes a cumulative distribution and inverse-CDF samples on
the CPU after copying all 2^n amplitudes back (quantum_simulator.c:256-283,
loop disabled at :68-73).  That stops working at the scale this framework
targets: at n=30 the state is 8 GB.  Here the distribution, the CDF and the
binary search all run on the TPU; only the sampled indices (a few KB) ever
reach the host.

Two-stage sampling keeps float32 CDFs accurate at large n: a single f32
cumsum over 2^30 probabilities accumulates ~1e-5 error and biases the tail,
so for n > STAGE_SPLIT_MIN the state is viewed as (rows, cols); stage 1
samples a row from the row-mass CDF, stage 2 samples a column within that
row.  Each cumsum is then over <= 2^15 terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STAGE_SPLIT_MIN = 20


@partial(jax.jit, static_argnums=(2, 3))
def _sample_direct(re, im, num_qubits, num_samples, key):
    p = re * re + im * im
    cdf = jnp.cumsum(p)
    u = jax.random.uniform(key, (num_samples,), dtype=cdf.dtype, maxval=cdf[-1])
    return jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)


@partial(jax.jit, static_argnums=(2, 3))
def _sample_three_stage(re, im, num_qubits, num_samples, key):
    """Group -> row -> column sampling on the flat state, n <= 30.

    The old two-stage form gathered a (num_samples, 2^(n - n//2)) row
    matrix per draw — a ~1.3 GB transient for 10k samples at n=29, on the
    engine whose whole point is memory margin.  Viewing the state as
    (2^(n-8), 256) rows instead keeps every per-sample gather at most
    (num_samples, 2^ceil((n-8)/2)) — ~40 MB for 10k samples at n=29 — and
    every cumsum spans <= ~2^11 terms, so float32 CDFs stay accurate.
    Row masses fuse into one reduction pass (no 2^n probability vector)."""
    n = num_qubits
    rb = n - 8
    R, C = 1 << rb, 256
    re2 = re.reshape(R, C)
    im2 = im.reshape(R, C)
    pr = jnp.sum(re2 * re2 + im2 * im2, axis=1)      # (R,) row masses
    g_bits = rb // 2
    rows_per = 1 << g_bits
    G = R >> g_bits
    pg = pr.reshape(G, rows_per)
    k1, k2, k3 = jax.random.split(key, 3)
    gmass = jnp.sum(pg, axis=1)
    gcdf = jnp.cumsum(gmass)
    u1 = jax.random.uniform(k1, (num_samples,), dtype=gcdf.dtype, maxval=gcdf[-1])
    g = jnp.minimum(jnp.searchsorted(gcdf, u1, side="right"), G - 1)
    prow = pg[g]                                     # (S, rows_per)
    rcdf = jnp.cumsum(prow, axis=1)
    u2 = jax.random.uniform(k2, (num_samples, 1), dtype=rcdf.dtype) * rcdf[:, -1:]
    r = jnp.minimum(jnp.sum(rcdf < u2, axis=1), rows_per - 1)
    # int32 basis indices cover n <= 30 exactly (2^30 < 2^31)
    row = g.astype(jnp.int32) * rows_per + r.astype(jnp.int32)
    rre = re2[row]                                   # (S, 256)
    rim = im2[row]
    pcols = rre * rre + rim * rim
    ccdf = jnp.cumsum(pcols, axis=1)
    u3 = jax.random.uniform(k3, (num_samples, 1), dtype=ccdf.dtype) * ccdf[:, -1:]
    c = jnp.minimum(jnp.sum(ccdf < u3, axis=1), C - 1)
    return (row << 8) | c.astype(jnp.int32)


def sample_state_device(re, im, num_qubits: int, num_samples: int, seed: int = 0):
    """Sample basis-state indices from a device-resident (re, im) state."""
    key = jax.random.PRNGKey(seed)
    if num_qubits <= STAGE_SPLIT_MIN:
        idx = _sample_direct(re, im, num_qubits, num_samples, key)
        return np.asarray(idx).astype(np.int64)
    return np.asarray(
        _sample_three_stage(re, im, num_qubits, num_samples, key)
    ).astype(np.int64)


@partial(jax.jit, static_argnums=(2,))
def _probs_topk(re, im, k):
    p = re * re + im * im
    vals, idx = jax.lax.top_k(p, k)
    return vals, idx


def top_amplitudes_device(re, im, k: int = 8):
    """(probabilities, indices) of the k most likely outcomes, on-device."""
    vals, idx = _probs_topk(re, im, k)
    return np.asarray(vals), np.asarray(idx).astype(np.int64)


@jax.jit
def norm_device(re, im):
    return jnp.sum(re * re) + jnp.sum(im * im)


@jax.jit
def norm_halves(re0, re1, im0, im1):
    """Norm of a column-half-split state (prefetch in-place layout)."""
    return (jnp.sum(re0 * re0) + jnp.sum(re1 * re1)
            + jnp.sum(im0 * im0) + jnp.sum(im1 * im1))


@partial(jax.jit, static_argnums=(4, 5))
def _sample_halves(re0, re1, im0, im1, num_qubits, num_samples, key):
    """Three-stage sampler over the split-half layout: group -> row ->
    column.  Never materializes the 2^n probability vector (the flat
    sampler's |p| alone is 4.3 GB at n=30), and every cumsum spans at most
    ~2^12 terms so float32 CDFs stay accurate."""
    R2 = re0.shape[0]
    rb = R2.bit_length() - 1          # row bits = n - 8
    g_bits = rb // 2
    rows_per = 1 << g_bits
    G = R2 >> g_bits
    pr = (jnp.sum(re0 * re0 + im0 * im0, axis=1)
          + jnp.sum(re1 * re1 + im1 * im1, axis=1))      # (R2,) row masses
    pg = pr.reshape(G, rows_per)
    k1, k2, k3 = jax.random.split(key, 3)
    gmass = jnp.sum(pg, axis=1)
    gcdf = jnp.cumsum(gmass)
    u1 = jax.random.uniform(k1, (num_samples,), dtype=gcdf.dtype,
                            maxval=gcdf[-1])
    g = jnp.minimum(jnp.searchsorted(gcdf, u1, side="right"), G - 1)
    prow = pg[g]                                          # (S, rows_per)
    rcdf = jnp.cumsum(prow, axis=1)
    u2 = jax.random.uniform(k2, (num_samples, 1), dtype=rcdf.dtype) * rcdf[:, -1:]
    r = jnp.minimum(jnp.sum(rcdf < u2, axis=1), rows_per - 1)
    # int32 spans indices to 2^31: covers n <= 30 basis indices exactly
    row = g.astype(jnp.int32) * rows_per + r.astype(jnp.int32)
    pcols = jnp.concatenate(
        [re0[row] ** 2 + im0[row] ** 2, re1[row] ** 2 + im1[row] ** 2],
        axis=1)                                           # (S, 256)
    ccdf = jnp.cumsum(pcols, axis=1)
    u3 = jax.random.uniform(k3, (num_samples, 1), dtype=ccdf.dtype) * ccdf[:, -1:]
    c = jnp.minimum(jnp.sum(ccdf < u3, axis=1), pcols.shape[1] - 1)
    return (row << 8) | c.astype(jnp.int32)


def sample_halves(re0, re1, im0, im1, num_qubits: int, num_samples: int,
                  seed: int = 0):
    """Sample basis-state indices from a split-half device state."""
    key = jax.random.PRNGKey(seed)
    idx = _sample_halves(re0, re1, im0, im1, num_qubits, num_samples, key)
    return np.asarray(idx).astype(np.int64)


@jax.jit
def _measure_project(re, im, qubit, u):
    """One mid-circuit measurement: P(bit=1), Born-rule outcome from the
    uniform draw ``u``, and the projected+renormalized state — a single
    device pass.  ``qubit`` is traced, so there is ONE executable per state
    width no matter which qubit is measured."""
    idx = jnp.arange(re.shape[0], dtype=jnp.uint32)
    bit = ((idx >> jnp.uint32(qubit)) & 1).astype(re.dtype)
    p = re * re + im * im
    p1 = jnp.sum(p * bit)
    total = jnp.sum(p)
    outcome = (u * total < p1).astype(jnp.int32)
    keep = jnp.where(outcome == 1, bit, 1.0 - bit)
    mass = jnp.where(outcome == 1, p1, total - p1)
    scale = jax.lax.rsqrt(jnp.maximum(mass, jnp.finfo(re.dtype).tiny))
    return re * keep * scale, im * keep * scale, outcome


def measure_qubit_device(re, im, qubit: int, u: float):
    """Measure one qubit of a device-resident state (Born rule, projective).

    Returns (re, im, outcome) with the state collapsed and renormalized.
    ``u`` is the uniform [0,1) draw deciding the outcome (callers own the
    RNG so trajectories are reproducible).
    """
    re, im, outcome = _measure_project(re, im, qubit, u)
    return re, im, int(outcome)


@partial(jax.jit, static_argnums=(2, 3))
def _expectation_z(re, im, zmask, num_qubits):
    p = re * re + im * im
    idx = jnp.arange(1 << num_qubits, dtype=jnp.uint32)
    # parity of the Z-string bits: +1 for even, -1 for odd
    bits = idx & jnp.uint32(zmask)
    par = bits
    for shift in (16, 8, 4, 2, 1):
        par = par ^ (par >> shift)
    sign = 1.0 - 2.0 * (par & 1).astype(p.dtype)
    return jnp.sum(p * sign)


def expectation_z(re, im, qubits, num_qubits: int) -> float:
    """<Z_{q1} Z_{q2} ...> of a device-resident state (no state transfer)."""
    zmask = 0
    for q in qubits:
        zmask |= 1 << q
    return float(_expectation_z(re, im, zmask, num_qubits))


def _parity_sign(bits, dtype):
    """+1/-1 for even/odd popcount of each uint32 entry."""
    par = bits
    for shift in (16, 8, 4, 2, 1):
        par = par ^ (par >> shift)
    return 1.0 - 2.0 * (par & 1).astype(dtype)


@partial(jax.jit, static_argnums=(4, 5))
def _expectation_z_halves(re0, re1, im0, im1, zmask, num_qubits):
    R2 = re0.shape[0]
    dt = re0.dtype
    # basis index = (row << 8) | c with c in [0,256); half h owns c's top bit
    srow = _parity_sign(
        jnp.arange(R2, dtype=jnp.uint32) & jnp.uint32(zmask >> 8), dt)
    col = jnp.arange(128, dtype=jnp.uint32)
    s0 = _parity_sign(col & jnp.uint32(zmask & 0xFF), dt)
    s1 = _parity_sign((col | 128) & jnp.uint32(zmask & 0xFF), dt)
    t0 = jnp.sum((re0 * re0 + im0 * im0) * s0[None, :], axis=1)
    t1 = jnp.sum((re1 * re1 + im1 * im1) * s1[None, :], axis=1)
    return jnp.sum(srow * (t0 + t1))


def expectation_z_halves(re0, re1, im0, im1, qubits, num_qubits: int) -> float:
    """<Z_{q1} Z_{q2} ...> of a column-half-split state (n >= 30 layout).

    One device pass over the four (R/2, 128) buffers, no state transfer —
    the split-state twin of :func:`expectation_z`.  For X/Y strings append
    the basis rotations to the circuit before ``run_device_halves`` and
    reduce the rotated state here.
    """
    zmask = 0
    for q in qubits:
        zmask |= 1 << q
    return float(_expectation_z_halves(re0, re1, im0, im1, zmask, num_qubits))


@partial(jax.jit, static_argnums=(4, 5))
def _topk_halves(re0, re1, im0, im1, k, block_rows):
    """Exact global top-k probabilities of a split state WITHOUT
    materializing the 2^n vector: scan row blocks, keep a running top-k
    (merge-and-reselect carry) — peak temp = one (block_rows, 256) tile."""
    R2 = re0.shape[0]
    nblk = R2 // block_rows

    def blk(h, start):
        rs = jax.lax.dynamic_slice_in_dim(h[0], start, block_rows, 0)
        im_ = jax.lax.dynamic_slice_in_dim(h[1], start, block_rows, 0)
        return rs * rs + im_ * im_

    def step(carry, b):
        vals, idx = carry
        start = b * block_rows
        p = jnp.concatenate(
            [blk((re0, im0), start), blk((re1, im1), start)], axis=1)
        # global index of tile entry (r, c): ((start + r) << 8) | col(c)
        r = jnp.arange(block_rows, dtype=jnp.int64)[:, None]
        c = jnp.arange(256, dtype=jnp.int64)[None, :]
        gidx = ((start.astype(jnp.int64) + r) << 8) | c
        bv, bi = jax.lax.top_k(p.reshape(-1), k)
        cand_v = jnp.concatenate([vals, bv])
        cand_i = jnp.concatenate([idx, gidx.reshape(-1)[bi]])
        mv, mi = jax.lax.top_k(cand_v, k)
        return (mv, cand_i[mi]), None

    init = (jnp.full((k,), -1.0, re0.dtype), jnp.zeros((k,), jnp.int64))
    (vals, idx), _ = jax.lax.scan(step, init,
                                  jnp.arange(nblk, dtype=jnp.int32))
    return vals, idx


def top_amplitudes_halves(re0, re1, im0, im1, k: int = 8,
                          block_rows: int = 4096):
    """(indices, probabilities) of the k most probable basis states of a
    split-half state — exact, device-side, <= one (block_rows, 256) tile
    of transient memory (the flat :func:`top_amplitudes_device` would need
    the 4.3 GB probability vector at n=30)."""
    R2 = re0.shape[0]
    block_rows = min(block_rows, R2)
    while R2 % block_rows:
        block_rows //= 2
    vals, idx = _topk_halves(re0, re1, im0, im1, int(k), int(block_rows))
    return np.asarray(idx), np.asarray(vals)


def amplitudes_halves(re0, re1, im0, im1, indices):
    """Complex amplitudes of selected basis indices from a split state.

    Device-side gather of just len(indices) values — the parity-check
    companion of the n >= 30 demos (no full-state transfer)."""
    idx = np.asarray(indices, dtype=np.int64)
    row = jnp.asarray(idx >> 8)
    col = jnp.asarray(idx & 0xFF)
    c_lo = jnp.minimum(col, 127)
    c_hi = jnp.maximum(col, 128) - 128
    lo = jnp.stack([re0[row, c_lo], im0[row, c_lo]], -1)
    hi = jnp.stack([re1[row, c_hi], im1[row, c_hi]], -1)
    out = np.asarray(jnp.where((col >= 128)[:, None], hi, lo))
    return out[:, 0] + 1j * out[:, 1]


def counts(samples, num_qubits: int, as_bitstrings: bool = True):
    """{outcome: count} from an array of sampled basis indices.

    ``as_bitstrings=True`` keys by MSB-first bitstrings (the CLI's
    MEASUREMENT rendering); otherwise by integer index."""
    idx, cnt = np.unique(np.asarray(samples), return_counts=True)
    if as_bitstrings:
        return {format(int(i), f"0{num_qubits}b"): int(c)
                for i, c in zip(idx, cnt)}
    return {int(i): int(c) for i, c in zip(idx, cnt)}


def xeb_fidelity(re, im, samples, num_qubits: int) -> float:
    """Linear cross-entropy benchmarking fidelity of a sample set against
    the device-resident ideal state: F = 2^n <p(s)>_samples - 1.

    The supremacy-era sanity metric for random-circuit sampling: ~1 when
    the samples follow |psi|^2 (Porter-Thomas), ~0 for uniform noise.
    Only the len(samples) gathered probabilities cross the boundary."""
    import jax.numpy as jnp

    idx = jnp.asarray(np.asarray(samples, dtype=np.int64))
    p = re[idx] ** 2 + im[idx] ** 2
    return float((1 << num_qubits) * jnp.mean(p) - 1.0)
