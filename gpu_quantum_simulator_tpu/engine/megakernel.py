"""Megakernel engine: the whole fused op-list in ONE compiled program.

The reference executes an entire circuit in a single kernel launch with gate
tables in constant/texture memory and __syncthreads() between ops
(quantum_simulator_preproces_constant.cu:169-191).  On TPU the compiler IS
the megakernel: we unroll the op list into one traced function and jit it —
XLA fuses elementwise chains, keeps the state in registers/VMEM across ops
where it can, and emits a single executable (one "launch").

Gate matrices are embedded as compile-time constants — the moral equivalent
of __constant__ memory, without the 1927-op budget
(MAX_COSTANT, quantum_simulator_preproces_constant.cu:32) or the chunked
re-upload loop of the constant_only variant (:312-340).

Executables are cached by an op-list fingerprint, so re-running the same
circuit (the benchmark's 5-run protocol, tester.bash) compiles once.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.oplist import Op
from ..ops import apply

_CACHE: dict = {}
_CACHE_LIMIT = 64


def _fingerprint(ops: Sequence[Op], num_qubits: int, real_dtype) -> str:
    h = hashlib.sha256()
    h.update(f"{num_qubits}|{real_dtype}".encode())
    for op in ops:
        h.update(op.kind.encode())
        h.update(np.asarray(op.qubits, dtype=np.int64).tobytes())
        if op.u is not None:
            h.update(np.ascontiguousarray(op.u).tobytes())
    return h.hexdigest()


def build_megakernel(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32):
    """Return a jitted (re, im) -> (re, im) applying the whole op list."""
    key = _fingerprint(ops, num_qubits, str(real_dtype))
    fn = _CACHE.get(key)
    if fn is not None:
        return fn
    fn = jax.jit(build_megakernel_fn(ops, num_qubits, real_dtype))
    if len(_CACHE) >= _CACHE_LIMIT:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = fn
    return fn


def build_megakernel_fn(ops: Sequence[Op], num_qubits: int, real_dtype=jnp.float32):
    """The raw (unjitted) whole-circuit closure — jittable, shard_map-able."""
    n = num_qubits
    # Bake matrices as numpy constants; closure-traced once.
    baked: List = []
    for op in ops:
        if op.kind == "cx":
            baked.append(("cx", op.qubits, None, None))
        else:
            baked.append(
                (
                    "u",
                    op.qubits,
                    np.asarray(op.u.real, dtype=np.dtype(real_dtype)),
                    np.asarray(op.u.imag, dtype=np.dtype(real_dtype)),
                )
            )

    def kernel(re, im):
        for kind, qs, ur, ui in baked:
            if kind == "cx":
                re, im = apply.apply_cnot(re, im, qs[0], qs[1], n)
            elif len(qs) == 1:
                re, im = apply.apply_1q(re, im, ur, ui, qs[0], n)
            elif len(qs) == 2:
                re, im = apply.apply_2q(re, im, ur, ui, qs[0], qs[1], n)
            else:
                re, im = apply.apply_kq(re, im, ur, ui, qs, n)
        return re, im

    return kernel
