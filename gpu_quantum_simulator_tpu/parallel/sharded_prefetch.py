"""Mesh-sharded prefetch engine: the distributed twin of engine/prefetch.

The round-2 sharded engine (parallel/sharded.py) unrolls the whole plan
into ONE jitted shard_map with gate matrices baked as constants — a deep
circuit blows the ~100 MB remote-compile MLIR cap, and every new circuit
at the same (n, mesh) recompiles everything: the exact disease the
single-chip prefetch engine cured.  This module applies the same cure on
the mesh:

* Per-device state block = the LOCAL nl = n - d qubits as the standard
  (R2L, 256) prefetch pair; every fused op is a runtime-table 256x256
  matmul on the fixed window, placed by tswap/perm/xswap/relayout steps —
  the single-chip kernels (get_block_kernel / get_relayout_kernel) are
  reused UNCHANGED under shard_map.
* A gate on a MESH-AXIS qubit is preceded by a planned ``gswap`` entry:
  exchange local window bit 7 with mesh bit g — a pairwise lax.ppermute
  column-half exchange riding ICI, shipping exactly half of each device's
  block (the minimum possible data motion for a qubit swap; distributed
  analog of the reference's relabeling, SURVEY §2.3 last row).
* The whole circuit executes as lax.scan chains over stacked tables in
  power-of-2 chunks: each chunk is ONE bounded-size executable (segmented
  — no monolithic unroll), compiled once per (n, mesh, chunk) and reused
  by EVERY later circuit at that geometry; a new circuit only uploads new
  tables.

Planner: plan_prefetch(num_global=d) — one planner serves both engines,
so commutation-aware scheduling and multi-qubit relayout batching apply
on the mesh too.
"""

from __future__ import annotations

import hashlib
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine import prefetch as PF
from ..engine.prefetch import (
    CAP_MATS,
    CAP_STEPS,
    DISPATCH_GRID_BUDGET,
    DVIEW,
    LANES,
    LOCAL_QUBITS,
    MIN_QUBITS,
    _get_expander,
    get_block_kernel,
    get_relayout_kernel,
    materialize_entries,
    perm_table,
    plan_prefetch,
    tile_rows,
)
from ..ir.oplist import Op

_SHARD_CHAIN_CACHE: dict = {}


def get_sharded_chain(mesh, axis: str, n: int, d: int, real_dtype,
                      precision: str, interpret: bool, num_blocks: int,
                      cap_steps: int = CAP_STEPS, cap_mats: int = CAP_MATS):
    """jitted shard_map'd lax.scan of ``num_blocks`` chain entries.

    Entry dispatch on scal[1]: 4 = gswap (ppermute half exchange on mesh
    bit scal[2]), 3 = local multi-qubit relayout, else a step block.  One
    compile per (mesh, n, d, capacity, num_blocks); tables are runtime
    arguments so every circuit at this geometry reuses the executable.
    """
    dt = np.dtype(real_dtype)
    key = ("shard", mesh, axis, n, d, dt.str, precision, interpret,
           num_blocks, cap_steps, cap_mats)
    fn = _SHARD_CHAIN_CACHE.get(key)
    if fn is not None:
        return fn

    nl = n - d
    R2L = 1 << (nl - LOCAL_QUBITS)
    n_dev = 1 << d
    kernel = get_block_kernel(nl, dt, precision, interpret, cap_steps, cap_mats)
    relay = (get_relayout_kernel(nl, dt, interpret)
             if R2L > tile_rows(nl) else None)

    def gswap_component(x, my, g):
        # Exchange local bit 7 (column half) with mesh bit g.  Basis
        # |G=a, L7=b>: amplitudes with b == a stay (new half = a); the
        # b != a half ships to the partner across mesh bit g and lands in
        # its other column half — each device sends exactly half its block.
        h0, h1 = x[:, :LANES], x[:, LANES:]
        keep = jnp.where(my == 0, h0, h1)
        send = jnp.where(my == 0, h1, h0)
        recv = jax.lax.ppermute(
            send, axis, [(i, i ^ (1 << g)) for i in range(n_dev)])
        nh0 = jnp.where(my == 0, keep, recv)
        nh1 = jnp.where(my == 0, recv, keep)
        return jnp.concatenate([nh0, nh1], axis=1)

    def per_device(re_blk, im_blk, scal, a_tab, b_tab, p_tab):
        re = re_blk.reshape(R2L, DVIEW)
        im = im_blk.reshape(R2L, DVIEW)

        def body(carry, x):
            r, i = carry
            s, a, b = x

            def run_gswap(c):
                my_idx = jax.lax.axis_index(axis)

                def mk(g):
                    def f(rr, ii):
                        my = (my_idx >> g) & 1
                        return (gswap_component(rr, my, g),
                                gswap_component(ii, my, g))

                    return f

                return jax.lax.switch(s[2], [mk(g) for g in range(d)],
                                      c[0], c[1])

            def run_block(c):
                return kernel(s, c[0], c[1], a, b, p_tab)

            if relay is None:
                out = jax.lax.cond(s[1] == 4, run_gswap, run_block, (r, i))
            else:
                def run_other(c):
                    return jax.lax.cond(
                        s[1] == 4, run_gswap,
                        lambda cc: relay(s, cc[0], cc[1]), c)

                out = jax.lax.cond(s[1] >= 3, run_other, run_block, (r, i))
            return out, None

        (re, im), _ = jax.lax.scan(body, (re, im), (scal, a_tab, b_tab))
        return re.reshape(-1), im.reshape(-1)

    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)), check_vma=False)
    chain = jax.jit(mapped, donate_argnums=(0, 1))
    chain.pure = mapped
    _SHARD_CHAIN_CACHE[key] = chain
    return chain


class ShardedPrefetchProgram:
    """Segmented, recompile-free sharded execution of one planned circuit.

    Construction compiles nothing new once the (mesh, n, capacity, chunk)
    chains exist; __call__ maps a P(axis)-sharded flat (re, im) pair
    through the chunk chain.  With ``final_layout`` = identity the program
    is layout-closed (repetitions compose; output in the original basis).
    """

    def __init__(
        self,
        ops: Sequence[Op],
        num_qubits: int,
        mesh,
        axis: str = "amp",
        real_dtype=jnp.float32,
        precision: str = "highest",
        interpret: Optional[bool] = None,
        cap_steps: int = CAP_STEPS,
        cap_mats: int = CAP_MATS,
        final_layout: Optional[Sequence[int]] = None,
        reorder: bool = True,
    ):
        n = num_qubits
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        d = int(math.log2(mesh.shape[axis]))
        nl = n - d
        if nl < MIN_QUBITS:
            raise ValueError(
                f"sharded prefetch needs >= {MIN_QUBITS} local qubits "
                f"(n={n}, mesh=2^{d}); use the dense sharded engine")
        dt = np.dtype(real_dtype)
        if reorder and n >= PF.PORTFOLIO_MIN_QUBITS and len(PF.PLAN_PORTFOLIO) > 1:
            # lookahead-depth portfolio, priced with the ICI gswap term
            # (engine/plancost.py) — mesh-bit exchanges dominate, so the
            # cheapest plan is usually the one with the fewest gswaps
            from ..engine import plancost

            best = None
            for waves in PF.PLAN_PORTFOLIO:
                cand = plan_prefetch(
                    ops, n, cap_steps, cap_mats, final_layout=final_layout,
                    reorder=reorder, allow_relayout=True, num_global=d,
                    lookahead_waves=waves)
                secs, _ = plancost.estimate_plan_sharded(cand, n, d)
                if best is None or secs < best[0]:
                    best = (secs, cand)
            plan = best[1]
        else:
            plan = plan_prefetch(
                ops, n, cap_steps, cap_mats, final_layout=final_layout,
                reorder=reorder, allow_relayout=True, num_global=d)
        self.num_qubits = n
        self.num_global = d
        self.mesh = mesh
        self.axis = axis
        self.plan = plan
        self.final_position = plan.final_position
        self.num_ops = plan.num_ops
        self.num_entries = len(plan.blocks)
        self.sharding = NamedSharding(mesh, P(axis))
        self.real_dtype = dt
        self._ptab = perm_table(dt)
        self._chain_parts = []
        self.chunk_sizes = []
        single_class = cap_mats <= 4
        # per-device grid rows bound the watchdog budget (see prefetch.py
        # DISPATCH_GRID_BUDGET); local state is 2^(n - d) amplitudes
        nl = n - d
        grid_rows = max((1 << max(nl - LOCAL_QUBITS, 0)) // tile_rows(nl), 1)
        max_chunk = max(32, DISPATCH_GRID_BUDGET // grid_rows)
        for (cap, sizes, scal, u_re, u_im, mvec, hvec, mvec_o,
             hvec_o, phases, mono) in materialize_entries(
                plan.blocks, cap_steps, cap_mats, dt,
                single_class=single_class, max_chunk=max_chunk,
                mono_as_mat=plan.mono_as_mat):
            off = 0
            for c in sizes:
                chain = get_sharded_chain(
                    mesh, axis, n, d, dt, precision, interpret, c,
                    cap_steps, cap)
                expander = _get_expander(c, cap, dt)
                a_tab, b_tab = expander(
                    jnp.asarray(u_re[off : off + c]),
                    jnp.asarray(u_im[off : off + c]),
                    jnp.asarray(mvec[off : off + c]),
                    jnp.asarray(hvec[off : off + c]),
                    jnp.asarray(mvec_o[off : off + c]),
                    jnp.asarray(hvec_o[off : off + c]),
                    jnp.asarray(phases[off : off + c]),
                    jnp.asarray(mono[off : off + c]),
                )
                self._chain_parts.append(
                    (chain, jnp.asarray(scal[off : off + c]), a_tab, b_tab))
                self.chunk_sizes.append(c)
                off += c

    def init_state(self, initial_parts=None):
        size = 1 << self.num_qubits
        if initial_parts is not None:
            re = jnp.asarray(initial_parts[0], dtype=self.real_dtype)
            im = jnp.asarray(initial_parts[1], dtype=self.real_dtype)
        else:
            re = jnp.zeros(size, dtype=self.real_dtype).at[0].set(1.0)
            im = jnp.zeros(size, dtype=self.real_dtype)
        return (jax.device_put(re, self.sharding),
                jax.device_put(im, self.sharding))

    def __call__(self, re, im):
        re = jax.device_put(re, self.sharding)
        im = jax.device_put(im, self.sharding)
        # Throttle the async chunk queue.  Unthrottled dispatch deadlocks
        # the in-process CPU backend on deep circuits: each queued chunk's
        # per-device execution parks a client thread-pool thread inside a
        # collective rendezvous, and once the pool is full of waiters from
        # DIFFERENT chunks no device can start the one chunk they are all
        # waiting on (observed at n=16 / >=1500 gates on an 8-device
        # virtual mesh).  A periodic barrier also unpins queued table
        # buffers (the prefetch engine throttles for the same reason).
        throttle = 2 if jax.default_backend() == "cpu" else 8
        for i, (chain, scal, a_tab, b_tab) in enumerate(self._chain_parts):
            re, im = chain(re, im, scal, a_tab, b_tab, self._ptab)
            if (i + 1) % throttle == 0:
                jax.block_until_ready((re, im))
        return re, im

    def lowered_mlir_sizes(self):
        """Bytes of StableHLO text per chunk executable (abstract lowering,
        nothing executed) — evidence each segment stays under the remote
        compiler's ~100 MB payload cap."""
        sizes = []
        re = jax.ShapeDtypeStruct((1 << self.num_qubits,), self.real_dtype,
                                  sharding=self.sharding)
        for chain, scal, a_tab, b_tab in self._chain_parts:
            low = chain.lower(
                re, re,
                jax.ShapeDtypeStruct(scal.shape, scal.dtype),
                jax.ShapeDtypeStruct(a_tab.shape, a_tab.dtype),
                jax.ShapeDtypeStruct(b_tab.shape, b_tab.dtype),
                jax.ShapeDtypeStruct(self._ptab.shape, self._ptab.dtype),
            )
            sizes.append(len(low.as_text()))
        return sizes


_RUN_CACHE: dict = {}
_RUN_CACHE_LIMIT = 8


def run_sharded_prefetch(circuit, config, initial_parts=None):
    """Simulator facade entry; returns (re, im, num_items, residual=None).

    Mirrors engine.prefetch.run_prefetch: relabel hot qubits low (the
    corrected reference permute pass), plan with the state routed back to
    the ORIGINAL basis in-plan (gswap/relayout restore steps), cache the
    program by circuit fingerprint.
    """
    from ..engine.prefetch import _circuit_fingerprint
    from ..engine.simulator import _fuse_pipeline
    from ..passes.permute import plan_permutation, unpermute_state
    from .mesh import make_mesh, num_global_qubits

    n = circuit.num_qubits
    if config.dtype != "complex64":
        raise ValueError(
            "the segmented sharded engine is float32-only; set "
            "shard_segmented=False for complex128 parity checks")
    axis = config.mesh_axis_names[0]
    mesh = make_mesh(config.mesh_shape, config.mesh_axis_names)
    d = num_global_qubits(mesh, axis)

    perm = plan_permutation(circuit)
    if np.array_equal(perm, np.arange(n)):
        perm = None

    reorder = getattr(config, "prefetch_reorder", None)
    if reorder is None:
        reorder = True

    from ..config import resolve_precision

    precision = resolve_precision(getattr(config, "precision", "highest"), n)

    run_key = (
        "shard", _circuit_fingerprint(circuit), precision,
        config.max_fused_qubits, bool(reorder), mesh, axis,
    )
    prog = _RUN_CACHE.get(run_key)
    if prog is None:
        if perm is None:
            work = circuit
            final_layout = np.arange(n)
        else:
            work = circuit.relabeled(perm)
            final_layout = np.argsort(perm)
        from ..engine.prefetch import LANE_QUBITS

        ops = _fuse_pipeline(
            work, min(config.max_fused_qubits, LANE_QUBITS), max_high=2,
            window=8)
        from ..engine.prefetch import CAP_MATS as _CAP

        cap_mats = 4 if n - d >= 21 else _CAP
        prog = ShardedPrefetchProgram(
            ops, n, mesh, axis, precision=precision,
            cap_mats=cap_mats,
            final_layout=final_layout, reorder=bool(reorder))
        if len(_RUN_CACHE) >= _RUN_CACHE_LIMIT:
            _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
        _RUN_CACHE[run_key] = prog

    if perm is not None and initial_parts is not None:
        iv = np.asarray(initial_parts[0]) + 1j * np.asarray(initial_parts[1])
        iv = unpermute_state(iv, np.argsort(perm))
        initial_parts = (np.ascontiguousarray(iv.real),
                         np.ascontiguousarray(iv.imag))

    re, im = prog.init_state(initial_parts)
    re, im = prog(re, im)
    total = (prog.plan.num_ops + prog.plan.num_tswaps + prog.plan.num_xswaps
             + prog.plan.num_gswaps + prog.plan.num_relayouts)
    # final_layout routed the state back to the original basis in-plan
    return re, im, total, None
