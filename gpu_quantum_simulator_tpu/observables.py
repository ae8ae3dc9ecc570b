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
