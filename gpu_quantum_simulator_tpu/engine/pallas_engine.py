"""Pallas engine: fused blocks as 128x128 MXU matmuls over a (R, 128) state.

Pipeline: fuse to <=7-qubit blocks, then run the low-region planner
(passes/shard.plan_sharded with the top n-7 qubits as the "global" region —
the single-chip twin of the mesh planner): every gate block is rewritten to
act on qubits 0..6 plus explicit low<->high qubit swaps.  Blocks expand to
dense 128x128 unitaries applied by the Pallas Karatsuba matmul kernel; swaps
are single fused XLA transposes.  The whole item stream is one jit.

This is the TPU-native endpoint of the reference's optimization arc:
  gate fusion (preproces) -> 4x4 blocks (4x4) -> constant-memory megakernel
  (constant) -> hot-qubits-low relabeling (permute)
all compose here into "every op is an MXU tile".
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.oplist import Op, expand_unitary
from ..ops import pallas_kernels as PK
from ..passes.shard import ShardPlan, SwapItem

_CACHE: dict = {}
_CACHE_LIMIT = 32


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def build_pallas_kernel(
    plan: ShardPlan, num_qubits: int, real_dtype=jnp.float32, interpret=None
):
    n = num_qubits
    R = 1 << (n - PK.LANE_QUBITS)
    if interpret is None:
        interpret = not _on_tpu()
    low = tuple(range(PK.LANE_QUBITS))

    baked: List = []
    h = hashlib.sha256(f"{n}|{real_dtype}|{interpret}".encode())
    for item in plan.items:
        if isinstance(item, SwapItem):
            baked.append(("swap", item.pos_b, item.pos_a, None))
            h.update(f"s{item.pos_a},{item.pos_b}".encode())
        else:
            if item.kind == "cx":
                from ..ir.oplist import op_matrix

                u, qs = op_matrix(item)
            else:
                u, qs = item.u, item.qubits
            m = expand_unitary(u, qs, low)
            mre = np.ascontiguousarray(m.real, dtype=np.dtype(real_dtype))
            mim = np.ascontiguousarray(m.imag, dtype=np.dtype(real_dtype))
            baked.append(("mat", None, None, (mre, mim)))
            h.update(b"m")
            h.update(mre.tobytes())
            h.update(mim.tobytes())
    key = h.hexdigest()
    if key in _CACHE:
        return _CACHE[key]

    def kernel(re, im):
        re = re.reshape(R, PK.LANES)
        im = im.reshape(R, PK.LANES)
        for kind, lo, hi, mats in baked:
            if kind == "swap":
                re, im = PK.swap_low_high(re, im, lo, hi, n)
            else:
                mre, mim = mats
                re, im = PK.apply_block128(re, im, mre, mim, interpret=interpret)
        return re.reshape(-1), im.reshape(-1)

    fn = jax.jit(kernel)
    if len(_CACHE) >= _CACHE_LIMIT:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = fn
    return fn


def run_pallas(circuit, config, initial_parts=None):
    """Entry used by the Simulator facade; returns (re, im, num_items)."""
    from ..ops.apply import initial_state_parts
    from ..passes.fuse4x4 import fuse_4x4
    from ..passes.fuse_k import fuse_k
    from ..passes.shard import plan_sharded

    n = circuit.num_qubits
    real_dtype = jnp.float32 if config.dtype == "complex64" else jnp.float64

    def start():
        if initial_parts is not None:
            return (
                jnp.asarray(initial_parts[0], dtype=real_dtype),
                jnp.asarray(initial_parts[1], dtype=real_dtype),
            )
        return initial_state_parts(n, dtype=real_dtype)

    if n <= PK.LANE_QUBITS:
        # state is a single 128-lane row (or less): megakernel handles it
        from .megakernel import build_megakernel

        ops = fuse_k(fuse_4x4(circuit), max_qubits=min(config.max_fused_qubits, n))
        re, im = start()
        re, im = build_megakernel(ops, n, real_dtype)(re, im)
        return re, im, len(ops), None

    k = min(config.max_fused_qubits, PK.LANE_QUBITS)
    ops = fuse_k(fuse_4x4(circuit), max_qubits=k)
    plan = plan_sharded(ops, n, n - PK.LANE_QUBITS)

    re, im = start()
    fn = build_pallas_kernel(plan, n, real_dtype)
    re, im = fn(re, im)

    perm = plan.final_position
    if np.array_equal(perm, np.arange(n)):
        perm = None
    return re, im, len(plan.items), perm
