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
