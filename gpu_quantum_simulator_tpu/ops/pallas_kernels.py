"""Pallas TPU kernels — the hot compute path.

Layout: the 2^n amplitude pair is a float32 matrix S of shape (R, 128) with
R = 2^(n-7): the low 7 qubits are the lane (column) index, the high n-7
qubits the row index.  After the low-region planner (passes/shard.plan_sharded
with d = n-7) every fused gate block acts on qubits 0..6, i.e. is a dense
128x128 unitary M applied as ``S @ M^T`` — exactly one MXU tile per matmul.
This is the TPU answer to the reference's 4x4 kernel (4-amplitude gathers,
quantum_simulator_4x4.cu:109-146): instead of widening 2->4 amplitudes per
thread, widen to the full 128-lane register and let the systolic array do a
dense 128x128 contraction at 7.5->hundreds of FLOP/byte.

Complex multiply uses the 3-multiplication Karatsuba form with the matrix
combinations precomputed on host:
    t1 = (S_re + S_im) @ M_re^T
    t2 = S_re @ (M_im - M_re)^T
    t3 = S_im @ (M_re + M_im)^T
    out_re = t1 - t3,  out_im = t1 + t2
saving 25% of MXU work vs the 4-matmul form.

Kernels are grid-tiled over rows so any n fits in VMEM; `interpret=True`
paths keep tests hermetic on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_QUBITS = 7          # low qubits mapped to the 128-lane dimension
LANES = 1 << LANE_QUBITS  # 128
DEFAULT_TILE_ROWS = 512


def _block_kernel(sre_ref, sim_ref, m1_ref, m2_ref, m3_ref, ore_ref, oim_ref):
    sre = sre_ref[:]
    sim = sim_ref[:]
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    t1 = dot(sre + sim, m1_ref[:])
    t2 = dot(sre, m2_ref[:])
    t3 = dot(sim, m3_ref[:])
    ore_ref[:] = t1 - t3
    oim_ref[:] = t1 + t2


def apply_block128(
    s_re: jnp.ndarray,
    s_im: jnp.ndarray,
    m_re: jnp.ndarray,
    m_im: jnp.ndarray,
    *,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """out = S @ M^T (complex), S: (R, 128), M: (128, 128).

    The host passes M split re/im; the Karatsuba combinations (already
    transposed for right-multiplication) are formed here — traced once per
    op inside the enclosing jit, constant-folded when M is baked.
    """
    R = s_re.shape[0]
    assert s_re.shape == (R, LANES) and m_re.shape == (LANES, LANES)
    tile = min(tile_rows, R)
    assert R % tile == 0, (R, tile)

    m1 = m_re.T                 # (S_re+S_im) @ M_re^T
    m2 = (m_im - m_re).T
    m3 = (m_re + m_im).T

    grid = (R // tile,)
    row_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, mat_spec, mat_spec, mat_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANES), s_re.dtype),
            jax.ShapeDtypeStruct((R, LANES), s_im.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * R * LANES * LANES,
            bytes_accessed=4 * (4 * R * LANES + 3 * LANES * LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )(s_re, s_im, m1, m2, m3)


def _butterfly_kernel(a_re_ref, a_im_ref, b_re_ref, b_im_ref,
                      u_ref, oa_re_ref, oa_im_ref, ob_re_ref, ob_im_ref):
    """2x2 butterfly across two row tiles (gate on a HIGH qubit).

    u_ref is (2, 4) SMEM: [[u00r,u00i,u01r,u01i],[u10r,u10i,u11r,u11i]].
    """
    a_re, a_im = a_re_ref[:], a_im_ref[:]
    b_re, b_im = b_re_ref[:], b_im_ref[:]
    u00r, u00i, u01r, u01i = u_ref[0, 0], u_ref[0, 1], u_ref[0, 2], u_ref[0, 3]
    u10r, u10i, u11r, u11i = u_ref[1, 0], u_ref[1, 1], u_ref[1, 2], u_ref[1, 3]
    oa_re_ref[:] = u00r * a_re - u00i * a_im + u01r * b_re - u01i * b_im
    oa_im_ref[:] = u00r * a_im + u00i * a_re + u01r * b_im + u01i * b_re
    ob_re_ref[:] = u10r * a_re - u10i * a_im + u11r * b_re - u11i * b_im
    ob_im_ref[:] = u10r * a_im + u10i * a_re + u11r * b_im + u11i * b_re


def apply_butterfly_high(
    s_re: jnp.ndarray,
    s_im: jnp.ndarray,
    u: np.ndarray,
    high_bit: int,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a 2x2 gate on row bit ``high_bit`` (qubit high_bit + 7).

    The (R, 128) state is viewed as (G, 2, S, 128) with S = 2^high_bit row
    stride; the kernel streams paired row tiles — one HBM pass, the same
    bytes/amplitude as the reference's kernel_gate
    (quantum_simulator_naive.cu:72-95) but 128-lane vectorized.
    """
    R = s_re.shape[0]
    stride = 1 << high_bit
    assert stride * 2 <= R
    g = R // (2 * stride)
    v_re = s_re.reshape(g, 2, stride, LANES)
    v_im = s_im.reshape(g, 2, stride, LANES)

    a_re, b_re = v_re[:, 0], v_re[:, 1]
    a_im, b_im = v_im[:, 0], v_im[:, 1]
    flat = lambda x: x.reshape(g * stride, LANES)

    utab = np.array(
        [
            [u[0, 0].real, u[0, 0].imag, u[0, 1].real, u[0, 1].imag],
            [u[1, 0].real, u[1, 0].imag, u[1, 1].real, u[1, 1].imag],
        ],
        dtype=np.float32,
    )

    rows = g * stride
    tile = min(DEFAULT_TILE_ROWS, rows)
    assert rows % tile == 0
    row_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)

    oa_re, oa_im, ob_re, ob_im = pl.pallas_call(
        _butterfly_kernel,
        grid=(rows // tile,),
        in_specs=[row_spec] * 4 + [u_spec],
        out_specs=[row_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), s_re.dtype)] * 4,
        interpret=interpret,
    )(flat(a_re), flat(a_im), flat(b_re), flat(b_im), jnp.asarray(utab))

    def unflat(a, b):
        return jnp.stack(
            [a.reshape(g, stride, LANES), b.reshape(g, stride, LANES)], axis=1
        ).reshape(R, LANES)

    return unflat(oa_re, ob_re), unflat(oa_im, ob_im)


def swap_low_high(re: jnp.ndarray, im: jnp.ndarray, low_bit: int, qubit: int, n: int):
    """Swap low qubit ``low_bit`` (< 7) with ``qubit`` (>= 7) — XLA transpose.

    One fused HBM pass; the distributed twin is parallel.sharded._swap_halves.
    """
    a, b = low_bit, qubit
    s_hi, s_mid, s_lo = 1 << (n - b - 1), 1 << (b - a - 1), 1 << a

    def one(x):
        v = x.reshape(s_hi, 2, s_mid, 2, s_lo)
        return jnp.swapaxes(v, 1, 3).reshape(x.shape)

    return one(re), one(im)
