"""Scan engine: recompile-free execution from dense gate tables.

The reference's constant-memory design separates the (fixed) kernel from the
(variable) gate tables uploaded via cudaMemcpyToSymbol
(quantum_simulator_preproces_constant.cu:448-451).  The XLA analog: compile
ONE ``lax.scan`` program per (num_qubits, padded-op-count bucket) whose
carried state is the amplitude pair and whose scanned inputs are the gate
tables — new circuits of similar depth reuse the executable with zero
recompilation, exactly like re-uploading constant memory.

Every table row is a CONTROLLED 1q gate, which uniformly encodes:
  * a plain 1q gate U on target t:         cmask=0,     tmask=1<<t
  * cx(c, t) (U = X):                      cmask=1<<c,  tmask=1<<t
  * identity padding:                      cmask=0,     tmask=0, U=I

The butterfly is branch-free with a dynamic target: partner amplitudes are
gathered at ``i XOR tmask`` — the reference's bit-insertion pair indexing
(quantum_simulator_naive.cu:79-80) expressed as an XOR gather instead of a
reshape, because the target is a traced value here.

(Controlled-U for free is a capability the reference lacks.)
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.oplist import Op


class GateTables(NamedTuple):
    """Dense SoA gate tables (the analog of d_Ur/d_Ui/d_Targ/d_Arg,
    quantum_simulator_preproces_constant.cu:58-61)."""

    ur: jnp.ndarray     # (ops, 2, 2) float
    ui: jnp.ndarray     # (ops, 2, 2) float
    tmask: jnp.ndarray  # (ops,) int32/int64: 1 << target (0 = padding)
    cmask: jnp.ndarray  # (ops,) int32/int64: 1 << control (0 = uncontrolled)


_X = np.array([[0.0, 1.0], [1.0, 0.0]])
_I = np.eye(2)


def build_tables(
    ops: Sequence[Op],
    pad_to: int,
    real_dtype=np.float32,
    index_dtype=np.int32,
) -> GateTables:
    """Pack a (1q + cx) op list into padded tables.

    Wider fused ops are not representable here; run fuse_2x2 first (the scan
    engine is the "preproces + constant tables" ablation, not the 4x4 one).
    """
    m = len(ops)
    if pad_to < m:
        raise ValueError("pad_to smaller than op count")
    ur = np.tile(_I, (pad_to, 1, 1)).astype(real_dtype)
    ui = np.zeros((pad_to, 2, 2), dtype=real_dtype)
    tmask = np.zeros(pad_to, dtype=index_dtype)
    cmask = np.zeros(pad_to, dtype=index_dtype)
    for j, op in enumerate(ops):
        if op.kind == "cx":
            c, t = op.qubits
            ur[j] = _X
            tmask[j] = 1 << t
            cmask[j] = 1 << c
        elif op.width == 1:
            ur[j] = op.u.real
            ui[j] = op.u.imag
            tmask[j] = 1 << op.qubits[0]
        else:
            raise ValueError(
                f"scan engine takes 1q/cx ops only, got width {op.width}"
            )
    return GateTables(jnp.asarray(ur), jnp.asarray(ui), jnp.asarray(tmask), jnp.asarray(cmask))


def bucket_size(num_ops: int, bucket: int) -> int:
    return max(bucket, -(-num_ops // bucket) * bucket)


@partial(jax.jit, static_argnums=(3,))
def run_tables(re, im, tables: GateTables, num_qubits: int):
    """Scan the gate tables over the state. One executable per (n, bucket)."""
    n = num_qubits
    idx = jnp.arange(1 << n, dtype=tables.tmask.dtype)

    def step(carry, row):
        re, im = carry
        ur, ui, tmask, cmask = row
        partner = idx ^ tmask
        pre = jnp.take(re, partner)
        pim = jnp.take(im, partner)
        tbit = (idx & tmask) != 0
        # select per-element matrix entries: row tbit of U acting on (self, partner)
        a_r = jnp.where(tbit, ur[1, 1], ur[0, 0])
        a_i = jnp.where(tbit, ui[1, 1], ui[0, 0])
        b_r = jnp.where(tbit, ur[1, 0], ur[0, 1])
        b_i = jnp.where(tbit, ui[1, 0], ui[0, 1])
        new_re = a_r * re - a_i * im + b_r * pre - b_i * pim
        new_im = a_r * im + a_i * re + b_r * pim + b_i * pre
        active = (idx & cmask) == cmask  # cmask==0 -> everywhere
        re = jnp.where(active, new_re, re)
        im = jnp.where(active, new_im, im)
        return (re, im), None

    (re, im), _ = jax.lax.scan(step, (re, im), tables)
    return re, im


def run_scan(ops: Sequence[Op], num_qubits: int, re, im, bucket: int = 256):
    tables = build_tables(
        ops,
        bucket_size(len(ops), bucket),
        real_dtype=np.dtype(re.dtype),
        index_dtype=np.int64 if num_qubits >= 31 else np.int32,
    )
    return run_tables(re, im, tables, num_qubits)
