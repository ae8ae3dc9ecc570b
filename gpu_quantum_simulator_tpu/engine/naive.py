"""Naive engine: one jitted device dispatch per gate.

The analog of the reference's launch-per-gate variant
(quantum_simulator_naive.cu:163-189) — and like it, this exists mostly as a
baseline for the ablation sweep: per-gate Python dispatch overhead is the
TPU analog of per-gate cudaLaunchKernel overhead.

Compiled applications are cached per (num_qubits, target, width) — the gate
MATRIX is a traced argument, so all rz angles / gate types on the same qubit
share one executable (like the reference passing U by value to one kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.circuit import Circuit
from ..ops import apply


@partial(jax.jit, static_argnums=(4, 5))
def _apply_1q(re, im, ur, ui, k: int, n: int):
    return apply.apply_1q(re, im, ur, ui, k, n)


@partial(jax.jit, static_argnums=(4, 5, 6))
def _apply_2q(re, im, ur, ui, qa: int, qb: int, n: int):
    return apply.apply_2q(re, im, ur, ui, qa, qb, n)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _apply_cnot(re, im, c: int, t: int, n: int):
    return apply.apply_cnot(re, im, c, t, n)


def run_naive(circuit: Circuit, re, im, real_dtype=jnp.float32):
    """Apply the raw gate stream, one dispatch per gate."""
    n = circuit.num_qubits
    for g in circuit.gates:
        if g.is_cx:
            re, im = _apply_cnot(re, im, g.qubits[0], g.qubits[1], n)
        else:
            u = g.matrix()
            ur = jnp.asarray(u.real, dtype=real_dtype)
            ui = jnp.asarray(u.imag, dtype=real_dtype)
            re, im = _apply_1q(re, im, ur, ui, g.qubits[0], n)
    return re, im


def run_oplist(ops, num_qubits: int, re, im, real_dtype=jnp.float32):
    """Apply a fused op list (1q/2q/cx), one dispatch per op — the analog of
    the reference's preproces/4x4 host flush loops."""
    n = num_qubits
    for op in ops:
        if op.kind == "cx":
            re, im = _apply_cnot(re, im, op.qubits[0], op.qubits[1], n)
            continue
        ur = jnp.asarray(op.u.real, dtype=real_dtype)
        ui = jnp.asarray(op.u.imag, dtype=real_dtype)
        if op.width == 1:
            re, im = _apply_1q(re, im, ur, ui, op.qubits[0], n)
        elif op.width == 2:
            re, im = _apply_2q(re, im, ur, ui, op.qubits[0], op.qubits[1], n)
        else:
            # wide blocks go through the traced k-qubit path (jit per shape)
            re, im = _apply_kq_jit(re, im, ur, ui, op.qubits, n)
    return re, im


@partial(jax.jit, static_argnums=(4, 5))
def _apply_kq_jit(re, im, ur, ui, qubits, n):
    return apply.apply_kq(re, im, ur, ui, qubits, n)


@partial(jax.jit, static_argnums=(6, 7, 8))
def _apply_3in1(re, im, ucr, uci, utr, uti, c: int, t: int, n: int):
    """flush(control acc) + flush(target acc) + CNOT in ONE dispatch."""
    re, im = apply.apply_1q(re, im, ucr, uci, c, n)
    re, im = apply.apply_1q(re, im, utr, uti, t, n)
    return apply.apply_cnot(re, im, c, t, n)


def run_3in1(circuit: Circuit, re, im, real_dtype=jnp.float32):
    """The reference "preproces_3in1" ablation, done correctly.

    The reference fuses both accumulator flushes and the CNOT into one
    kernel launch but (a) forgets to reset the target's accumulator
    (double-apply, quantum_simulator_preproces_3in1.cu:275) and (b) uses
    block-local __syncthreads() between grid-wide phases (:163-173), so its
    phases race.  Here the three stages are one traced program — XLA's
    dataflow ordering makes the race structurally impossible — and both
    accumulators reset.
    """
    n = circuit.num_qubits
    eye = np.eye(2)
    acc = [None] * n

    def mats(a):
        u = eye if a is None else a
        return (
            jnp.asarray(u.real, dtype=real_dtype),
            jnp.asarray(u.imag, dtype=real_dtype),
        )

    for g in circuit.gates:
        if g.is_cx:
            c, t = g.qubits
            ucr, uci = mats(acc[c])
            utr, uti = mats(acc[t])
            re, im = _apply_3in1(re, im, ucr, uci, utr, uti, c, t, n)
            acc[c] = acc[t] = None
        else:
            q = g.qubits[0]
            m = g.matrix()
            acc[q] = m if acc[q] is None else m @ acc[q]

    for q in range(n):
        if acc[q] is not None:
            ur, ui = mats(acc[q])
            re, im = _apply_1q(re, im, ur, ui, q, n)
    return re, im
