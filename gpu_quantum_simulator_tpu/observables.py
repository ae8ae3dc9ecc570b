"""Pauli-string observables: expectations of arbitrary I/X/Y/Z strings
and their weighted sums (Hamiltonians).

Beyond-reference capability (the reference measures nothing but sampled
bitstrings).  Implementation is engine-agnostic and TPU-friendly: an
X/Y factor is rotated into the Z basis by appending one-qubit basis
changes to the circuit (X -> H, Y -> S^dag then H), after which the
diagonal Z-string reduces on device (sampling.expectation_z) with no
state transfer.  Strings sharing a measurement basis are grouped so a
k-term Hamiltonian costs one circuit execution per distinct basis, not
per term — the standard commuting-group trick.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit


def _parse_pauli(pauli: str, num_qubits: int) -> Dict[int, str]:
    """{'X'|'Y'|'Z' by qubit} from either a dense string ("IXZY", qubit 0
    leftmost) or a sparse spec ("X0 Z3 Y5")."""
    ops: Dict[int, str] = {}
    s = pauli.strip().upper()
    if " " in s or any(ch.isdigit() for ch in s):
        for term in s.split():
            p, q = term[0], int(term[1:])
            if p not in "IXYZ":
                raise ValueError(f"bad Pauli factor {term!r}")
            if q >= num_qubits:
                raise ValueError(f"qubit {q} out of range in {pauli!r}")
            if p != "I":
                ops[q] = p
    else:
        if len(s) != num_qubits:
            raise ValueError(
                f"dense Pauli string length {len(s)} != {num_qubits} qubits")
        for q, p in enumerate(s):
            if p not in "IXYZ":
                raise ValueError(f"bad Pauli factor {p!r}")
            if p != "I":
                ops[q] = p
    return ops


def _basis(ops: Dict[int, str]) -> Tuple[Tuple[int, str], ...]:
    """Measurement-basis fingerprint: the non-Z rotations required."""
    return tuple(sorted((q, p) for q, p in ops.items() if p != "Z"))


def _with_rotations(circuit: Circuit, basis) -> Circuit:
    c = Circuit(circuit.num_qubits, list(circuit.gates))
    for q, p in basis:
        if p == "X":
            c.h(q)
        elif p == "Y":
            c.sdg(q)
            c.h(q)
    return c


def expectation_pauli(
    circuit: Circuit,
    pauli: str,
    config: Optional[SimulatorConfig] = None,
) -> float:
    """<P> for one Pauli string after running ``circuit``."""
    return expectation_pauli_sum(circuit, [(1.0, pauli)], config)


def expectation_pauli_sum(
    circuit: Circuit,
    terms: Sequence[Tuple[float, str]],
    config: Optional[SimulatorConfig] = None,
) -> float:
    """<H> for H = sum_k c_k P_k, grouped by measurement basis.

    One circuit execution per DISTINCT basis (set of non-Z factors); all
    Z-string reductions for that basis run on the same device state.
    """
    from .engine.simulator import Simulator
    from .sampling import expectation_z

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    n = circuit.num_qubits

    groups: Dict[tuple, List[Tuple[float, Dict[int, str]]]] = {}
    const = 0.0
    for coeff, pauli in terms:
        ops = _parse_pauli(pauli, n)
        if not ops:
            const += coeff          # identity term
            continue
        groups.setdefault(_basis(ops), []).append((float(coeff), ops))

    total = const
    for basis, members in groups.items():
        rotated = _with_rotations(circuit, basis)
        if cfg.strategy == "reference":
            state = sim.run(rotated)
            p = np.abs(state) ** 2
            idx = np.arange(p.shape[0])
            for coeff, ops in members:
                par = np.zeros_like(idx)
                for q in ops:
                    par ^= (idx >> q) & 1
                total += coeff * float(np.sum(p * (1.0 - 2.0 * par)))
            continue
        re, im, _ = sim.run_device(rotated)
        for coeff, ops in members:
            total += coeff * expectation_z(re, im, list(ops), n)
    return total


def overlap(a, b, config: Optional[SimulatorConfig] = None) -> complex:
    """<psi_a | psi_b> with both states device-resident.

    ``a`` / ``b``: a Circuit (executed from |0...0>) or an explicit complex
    state vector.  The inner product reduces on device — four dot products
    on the split (re, im) pairs — so only one complex scalar crosses the
    device boundary.  Both states must fit in HBM simultaneously (n <= 29
    in float32 on one v5e chip)."""
    import jax.numpy as jnp

    from .engine.simulator import Simulator

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)

    def parts(x):
        if isinstance(x, Circuit):
            re, im, _ = sim.run_device(x)
            return re, im, x.num_qubits
        arr = np.asarray(x)
        n = int(arr.shape[0]).bit_length() - 1
        if arr.shape[0] != 1 << n:
            raise ValueError(f"state length {arr.shape[0]} is not a power of 2")
        dt = jnp.float64 if cfg.dtype == "complex128" else jnp.float32
        return (jnp.asarray(arr.real, dt), jnp.asarray(arr.imag, dt), n)

    ra, ia, na = parts(a)
    rb, ib, nb = parts(b)
    if na != nb:
        raise ValueError(f"state widths differ: {na} vs {nb} qubits")
    # conj(a) . b = (ra - i ia) . (rb + i ib)
    real = jnp.vdot(ra, rb) + jnp.vdot(ia, ib)
    imag = jnp.vdot(ra, ib) - jnp.vdot(ia, rb)
    return complex(float(real), float(imag))


def state_fidelity(a, b, config: Optional[SimulatorConfig] = None) -> float:
    """|<psi_a | psi_b>|^2 (pure-state fidelity), device-side reduction."""
    v = overlap(a, b, config)
    return v.real * v.real + v.imag * v.imag
