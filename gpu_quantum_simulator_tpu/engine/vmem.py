"""VMEM-resident whole-circuit Pallas megakernel.

The endpoint of the reference's megakernel arc: where the reference ran the
whole circuit in one CUDA launch with gate tables in constant memory and the
state in HBM (quantum_simulator_preproces_constant.cu:169-191), here the
whole circuit runs inside ONE Pallas kernel with the state resident in VMEM
— zero HBM traffic for amplitudes between ops, zero per-op launch overhead.
Gate matrices stream from HBM via double-buffered async DMA (the
constant-memory upload, reimagined as a pipeline).

Op model = engine/wide.py's: every fused block acts on the 7 lane qubits
plus kh <= 2 row qubits; kh > 0 ops reshape/transpose ROW axes in VMEM
(sublane shuffles, no lane crossing) and contract one (R', D) @ (D, D).

Fits when 4 state buffers + matrix buffers stay under ~16 MB VMEM:
n <= 19 for float32.  Larger n falls back to the HBM-streaming wide program.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ir.oplist import Op
from .wide import LANE_QUBITS, LANES, _op_spec

VMEM_MAX_QUBITS = 19


    # One Pallas kernel per <=CHUNK_OPS-op segment: a single fully-unrolled
    # Mosaic program for a deep circuit exceeds compiler request limits, so
    # the circuit is chunked — the same shape as the reference's <=1927-op
    # constant-memory rounds (quantum_simulator_preproces_constant_only.cu:312-340),
    # except a chunk boundary costs one VMEM<->VMEM handoff, not a re-upload.
CHUNK_OPS = 96


def build_vmem_program(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32,
                       interpret: bool = False, chunk_ops: int = CHUNK_OPS):
    # each chunk is its own jit: one remote-compile request per chunk keeps
    # every request under the compiler's size limit; arrays stay on device
    # between chunk dispatches (~0.5 ms each)
    chunks = [
        jax.jit(_build_vmem_chunk(ops[i : i + chunk_ops], num_qubits, real_dtype, interpret), donate_argnums=(0, 1))
        for i in range(0, len(ops), chunk_ops)
    ]

    def fn(re, im):
        for c in chunks:
            re, im = c(re, im)
        return re, im

    return fn


def _build_vmem_chunk(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32,
                      interpret: bool = False):
    n = num_qubits
    assert LANE_QUBITS < n <= VMEM_MAX_QUBITS
    nrow = n - LANE_QUBITS
    R = 1 << nrow

    specs = [_op_spec(op, n) for op in ops]
    dt = np.dtype(real_dtype)

    by_d: Dict[int, list] = {}
    steps = []  # (D, idx_in_bucket, row_bits tuple)
    for kh, row_bits, D, bre, bim in specs:
        if kh > 2:
            raise ValueError("vmem program requires blocks with <= 2 high qubits")
        bucket = by_d.setdefault(D, [])
        steps.append((D, len(bucket), tuple(row_bits)))
        # store transposed so the kernel right-multiplies with a plain dot
        bucket.append((bre.T.astype(dt), bim.T.astype(dt)))

    d_order = sorted(by_d)
    mats_inputs = []
    for D in d_order:
        mats_inputs.append(jnp.asarray(np.stack([m[0] for m in by_d[D]])))
        mats_inputs.append(jnp.asarray(np.stack([m[1] for m in by_d[D]])))

    d_slot = {D: i for i, D in enumerate(d_order)}

    def kernel(*refs):
        n_mat = 2 * len(d_order)
        mat_refs = refs[:n_mat]
        in_re, in_im, out_re, out_im = refs[n_mat:n_mat + 4]
        scratch = refs[n_mat + 4:]
        mbufs = scratch[:n_mat]
        sems = scratch[n_mat:]

        out_re[:] = in_re[:]
        out_im[:] = in_im[:]

        def start_dma(j):
            D, idx, _ = steps[j]
            b = d_slot[D]
            for c in range(2):  # re, im
                pltpu.make_async_copy(
                    mat_refs[2 * b + c].at[idx],
                    mbufs[2 * b + c],
                    sems[2 * b + c],
                ).start()

        def wait_dma(j):
            D, idx, _ = steps[j]
            b = d_slot[D]
            for c in range(2):
                pltpu.make_async_copy(
                    mat_refs[2 * b + c].at[idx],
                    mbufs[2 * b + c],
                    sems[2 * b + c],
                ).wait()

        # in-place: read the whole state value, compute, write back — value
        # semantics order the write after both reads, no ping-pong buffers
        for j, (D, idx, row_bits) in enumerate(steps):
            start_dma(j)
            wait_dma(j)
            b = d_slot[D]
            mret = mbufs[2 * b + 0][:]   # (D, D), already transposed
            mimt = mbufs[2 * b + 1][:]

            vre, vim = out_re[:], out_im[:]
            kh = len(row_bits)
            if kh == 0:
                a_re, a_im = vre.reshape(-1, D), vim.reshape(-1, D)
            elif kh == 1:
                b1 = row_bits[0]
                g, s = R >> (b1 + 1), 1 << b1

                def fwd1(x):
                    t = x.reshape(g, 2, s, LANES).transpose(0, 2, 1, 3)
                    return t.reshape(-1, D)

                a_re, a_im = fwd1(vre), fwd1(vim)
            else:
                b1, b2 = row_bits  # b1 < b2
                g = R >> (b2 + 1)
                m = 1 << (b2 - b1 - 1)
                s = 1 << b1

                def fwd2(x):
                    t = x.reshape(g, 2, m, 2, s, LANES).transpose(0, 2, 4, 1, 3, 5)
                    return t.reshape(-1, D)

                a_re, a_im = fwd2(vre), fwd2(vim)

            dot = lambda a, m2: jnp.dot(
                a, m2, preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST,
            )
            o_re = dot(a_re, mret) - dot(a_im, mimt)
            o_im = dot(a_im, mret) + dot(a_re, mimt)

            if kh == 0:
                o_re = o_re.reshape(R, LANES)
                o_im = o_im.reshape(R, LANES)
            elif kh == 1:
                b1 = row_bits[0]
                g, s = R >> (b1 + 1), 1 << b1

                def bwd1(x):
                    t = x.reshape(g, s, 2, LANES).transpose(0, 2, 1, 3)
                    return t.reshape(R, LANES)

                o_re, o_im = bwd1(o_re), bwd1(o_im)
            else:
                b1, b2 = row_bits
                g = R >> (b2 + 1)
                m = 1 << (b2 - b1 - 1)
                s = 1 << b1

                def bwd2(x):
                    t = x.reshape(g, m, s, 2, 2, LANES).transpose(0, 3, 1, 4, 2, 5)
                    return t.reshape(R, LANES)

                o_re, o_im = bwd2(o_re), bwd2(o_im)

            out_re[:] = o_re
            out_im[:] = o_im

    scratch_shapes = [
        pltpu.VMEM((D, D), dt) for D in d_order for _ in range(2)
    ] + [
        pltpu.SemaphoreType.DMA(()) for _ in range(2 * len(d_order))
    ]

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * len(d_order))
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, LANES), dt)] * 2,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def chunk_fn(re, im):
        o_re, o_im = call(*mats_inputs, re.reshape(R, LANES), im.reshape(R, LANES))
        return o_re.reshape(-1), o_im.reshape(-1)

    return chunk_fn


_CACHE: dict = {}
_CACHE_LIMIT = 16


def build_vmem_program_cached(ops, num_qubits, real_dtype=jnp.float32, interpret=False):
    h = hashlib.sha256(f"v|{num_qubits}|{real_dtype}|{interpret}".encode())
    for op in ops:
        h.update(op.kind.encode())
        h.update(np.asarray(op.qubits, dtype=np.int64).tobytes())
        if op.u is not None:
            h.update(np.ascontiguousarray(op.u).tobytes())
    key = h.hexdigest()
    fn = _CACHE.get(key)
    if fn is None:
        fn = build_vmem_program(ops, num_qubits, real_dtype, interpret)
        if len(_CACHE) >= _CACHE_LIMIT:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = fn
    return fn
