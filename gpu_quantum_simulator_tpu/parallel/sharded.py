"""Mesh-sharded state-vector engine.

Layout: the flat 2^n amplitude pair is sharded P('amp') — contiguous blocks,
so the top d = log2(mesh) qubits are the device-id bits and the low n-d
qubits are local.  The whole planned item stream (local fused ops + qubit
swaps) is unrolled inside ONE jitted shard_map: local ops reuse the exact
single-chip apply primitives on the 2^(n-d) block; a swap of global position
``p`` with local position ``l`` is a pairwise half-block exchange with the
device across mesh-axis bit ``p-(n-d)`` via lax.ppermute (pure ICI traffic,
no host roundtrip).

Swap derivation (bit A = global p, bit B = local l, device bit a, block half
b = bit l): amplitudes with b == a stay put (their new local bit equals the
old device bit); amplitudes with b != a move to the partner device and land
in its half l == 1 - partner_bit.  So each device ships exactly half a block
— the minimum possible data motion for a qubit swap.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ir.oplist import Op
from ..ops import apply as A
from ..passes.shard import LocalSwapItem, ShardPlan, SwapItem


def _local_swap(re, im, a: int, b: int, local_n: int):
    """Exchange two LOCAL bit positions of the per-device block (no ICI).

    local_n >= 8 uses the tile-friendly low-rank forms (lane bits cross via
    exact 0/1 permutation matmuls, ops/apply._swap_bits_device); smaller
    blocks use a rank-5 transpose.
    """
    if a > b:
        a, b = b, a
    if local_n >= 8:
        return A._swap_bits_device(re, im, a, b, local_n)
    s_hi, s_mid, s_lo = 1 << (local_n - b - 1), 1 << (b - a - 1), 1 << a

    def one(x):
        v = x.reshape(s_hi, 2, s_mid, 2, s_lo)
        return jnp.swapaxes(v, 1, 3).reshape(-1)

    return one(re), one(im)


def _swap_halves(block, axis_index, gb: int, l: int, local_n: int, axis: str):
    """Exchange global bit gb (of the device index) with local bit l."""
    hi, lo = 1 << (local_n - l - 1), 1 << l
    v = block.reshape(hi, 2, lo)
    my_bit = (axis_index >> gb) & 1
    keep = jnp.take(v, my_bit, axis=1)          # half with b == a (stays)
    move = jnp.take(v, 1 - my_bit, axis=1)      # half with b != a (ships)
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, i ^ (1 << gb)) for i in range(n_dev)]
    recv = jax.lax.ppermute(move, axis, perm)
    # kept half occupies slot my_bit; received occupies 1 - my_bit
    pair = jnp.stack([keep, recv], axis=1)          # [keep@my_bit, recv@other]
    flip = jnp.stack([recv, keep], axis=1)
    v = jnp.where(my_bit == 0, pair, flip)
    return v.reshape(-1)


def build_sharded_kernel(
    plan: ShardPlan,
    num_qubits: int,
    mesh: Mesh,
    axis: str = "amp",
    real_dtype=jnp.float32,
):
    """One jitted program applying the whole plan to a P('amp')-sharded state."""
    n = num_qubits
    d = int(math.log2(mesh.shape[axis]))
    local_n = n - d

    baked = []
    for item in plan.items:
        if isinstance(item, SwapItem):
            baked.append(("swap", item.pos_a - local_n, item.pos_b, None, None))
        elif isinstance(item, LocalSwapItem):
            baked.append(("lswap", item.pos_a, item.pos_b, None, None))
        elif item.kind == "cx":
            baked.append(("cx", item.qubits[0], item.qubits[1], None, None))
        else:
            baked.append(
                (
                    "u",
                    item.qubits,
                    None,
                    np.asarray(item.u.real, dtype=np.dtype(real_dtype)),
                    np.asarray(item.u.imag, dtype=np.dtype(real_dtype)),
                )
            )

    def per_device(re_blk, im_blk):
        idx = jax.lax.axis_index(axis)
        re, im = re_blk.reshape(-1), im_blk.reshape(-1)
        for kind, a, b, ur, ui in baked:
            if kind == "swap":
                re = _swap_halves(re, idx, a, b, local_n, axis)
                im = _swap_halves(im, idx, a, b, local_n, axis)
            elif kind == "lswap":
                re, im = _local_swap(re, im, a, b, local_n)
            elif kind == "cx":
                re, im = A.apply_cnot(re, im, a, b, local_n)
            elif len(a) == 1:
                re, im = A.apply_1q(re, im, ur, ui, a[0], local_n)
            elif len(a) == 2:
                re, im = A.apply_2q(re, im, ur, ui, a[0], a[1], local_n)
            else:
                re, im = A.apply_kq(re, im, ur, ui, a, local_n)
        return re, im

    mapped = jax.shard_map(
        per_device, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=(P(axis), P(axis))
    )
    return jax.jit(mapped)


class ShardedProgram:
    """A compiled sharded plan bound to a mesh: callable on flat (re, im).

    Used both by run_sharded (one-shot) and run_device_iterated (the body
    is planned layout-closed via restore_layout so repetitions compose).
    """

    def __init__(self, circuit, config, restore_layout: bool = False):
        from ..passes.fuse4x4 import fuse_4x4
        from ..passes.fuse_k import fuse_k
        from ..passes.shard import plan_sharded
        from .mesh import make_mesh, num_global_qubits

        n = circuit.num_qubits
        axis = config.mesh_axis_names[0]
        mesh = make_mesh(config.mesh_shape, config.mesh_axis_names)
        d = num_global_qubits(mesh, axis)
        if d >= n:
            raise ValueError(f"{n}-qubit state cannot shard over 2^{d} devices")
        local_n = n - d

        k = min(config.max_fused_qubits, local_n, n)
        # two-level planning: cap fused blocks at 2 logical qubits above the
        # lane region AND have the planner relocate crowded device-high
        # positions (LocalSwapItem) so the per-device apply keeps to wide
        # matmuls at any local_n
        max_high = 2 if local_n > 7 else None
        ops = fuse_k(fuse_4x4(circuit), max_qubits=k, max_high=max_high)
        plan = plan_sharded(
            ops, n, d,
            max_local_high=2 if local_n > 7 else None,
            restore_layout=restore_layout,
        )

        self.num_qubits = n
        self.mesh = mesh
        self.plan = plan
        self.real_dtype = jnp.float32 if config.dtype == "complex64" else jnp.float64
        self.sharding = NamedSharding(mesh, P(axis))
        self._kernel = build_sharded_kernel(plan, n, mesh, axis, self.real_dtype)

    def init_state(self, initial_parts=None):
        size = 1 << self.num_qubits
        if initial_parts is not None:
            re = jnp.asarray(initial_parts[0], dtype=self.real_dtype)
            im = jnp.asarray(initial_parts[1], dtype=self.real_dtype)
        else:
            re = jnp.zeros(size, dtype=self.real_dtype).at[0].set(1.0)
            im = jnp.zeros(size, dtype=self.real_dtype)
        return jax.device_put(re, self.sharding), jax.device_put(im, self.sharding)

    def __call__(self, re, im):
        # no-op when already laid out P('amp'); reshards replicated inputs
        re = jax.device_put(re, self.sharding)
        im = jax.device_put(im, self.sharding)
        return self._kernel(re, im)

    @property
    def residual(self):
        perm = self.plan.final_position
        if np.array_equal(perm, np.arange(self.num_qubits)):
            return None
        return perm


def run_sharded(circuit, config, initial_parts=None):
    """Entry used by the Simulator facade; returns (re, im, num_ops, perm)."""
    prog = ShardedProgram(circuit, config)
    re, im = prog.init_state(initial_parts)
    re, im = prog(re, im)
    # The plan's swaps leave a layout permutation; the Simulator undoes it
    # on-device (a global transpose XLA implements with ICI collectives).
    return re, im, len(prog.plan.items), prog.residual
