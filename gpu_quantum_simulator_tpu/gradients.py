"""Gradients of observable expectations w.r.t. gate parameters.

The reference has no training/VQE story at all; this closes the gap the
TPU-native way: the parameter-shift rule evaluates exact gradients with two
full circuit executions per parameter, so EVERY engine (including the
recompile-free ``prefetch`` flagship, where shifted circuits reuse the same
executables) doubles as a gradient engine.  Valid for the single-parameter
rotation family in the gate set — rz/rx/ry/p all have generators with
eigenvalues {0, ±1/2} (rz(θ) = diag(1, e^{iθ}), quantum_simulator.c:205-208
phase convention), for which

    dE/dθ = [E(θ + π/2) − E(θ − π/2)] / 2.

For small systems ``expectation_fn`` can instead be fed to jax.grad through
a differentiable rebuild; parameter-shift needs no tracing and matches f64
finite differences to ~1e-6 (tests/test_gradients.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit

SHIFT_RULE_GATES = ("rz", "rx", "ry", "p")


def parameterized_gates(circuit: Circuit) -> List[int]:
    """Indices of gates the shift rule differentiates."""
    return [
        i
        for i, g in enumerate(circuit.gates)
        if g.name in SHIFT_RULE_GATES and g.params
    ]


def _shifted(circuit: Circuit, gate_index: int, delta: float) -> Circuit:
    c = Circuit(circuit.num_qubits, list(circuit.gates))
    g = c.gates[gate_index]
    c.gates[gate_index] = type(g)(g.name, g.qubits, (g.params[0] + delta,))
    return c


def expectation(circuit: Circuit, z_qubits: Sequence[int],
                config: Optional[SimulatorConfig] = None) -> float:
    """<Z_{q1} Z_{q2} ...> after running ``circuit`` (device-side reduce)."""
    from .engine.simulator import Simulator
    from .sampling import expectation_z

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    if cfg.strategy == "reference":  # host engine: reduce on host
        state = sim.run(circuit)
        zmask = 0
        for q in z_qubits:
            zmask |= 1 << q
        signs = 1.0 - 2.0 * (
            np.bitwise_count(np.arange(state.size) & zmask).astype(np.int64) & 1
        )
        return float(np.sum(signs * np.abs(state) ** 2))
    re, im, _ = sim.run_device(circuit)
    return expectation_z(re, im, z_qubits, circuit.num_qubits)


def parameter_shift(
    circuit: Circuit,
    z_qubits: Sequence[int] = (),
    config: Optional[SimulatorConfig] = None,
    gate_indices: Optional[Sequence[int]] = None,
    expectation_fn=None,
) -> Tuple[np.ndarray, List[int]]:
    """(gradient array, gate indices): d<Z...>/dθ_k for each rotation gate.

    2 executions per parameter; with ``strategy="prefetch"`` the shifted
    circuits share every compiled executable, so a full gradient sweep is
    pure table-upload + execution.  ``expectation_fn(circuit) -> float``
    replaces the default Z-string expectation — any objective that is a
    fixed functional of the circuit works (e.g. a noisy Pauli sum: the
    shift rule stays exact because the channels are θ-independent).
    """
    if expectation_fn is None:
        expectation_fn = lambda c: expectation(c, z_qubits, config)
    idxs = list(gate_indices) if gate_indices is not None else parameterized_gates(circuit)
    grads = np.zeros(len(idxs))
    for j, i in enumerate(idxs):
        plus = expectation_fn(_shifted(circuit, i, math.pi / 2))
        minus = expectation_fn(_shifted(circuit, i, -math.pi / 2))
        grads[j] = 0.5 * (plus - minus)
    return grads, idxs


def parameter_shift_noisy(
    circuit: Circuit,
    terms,
    shots: int = 4096,
    kind: str = "depolarizing",
    p1: float = 0.0,
    p2: float = 0.0,
    seed: int = 0,
    config: Optional[SimulatorConfig] = None,
    gate_indices: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[int]]:
    """Parameter-shift gradient of a noisy Pauli-sum expectation.

    Each shifted evaluation is a batched trajectory ensemble
    (dynamic.expectation_noisy) with a FIXED seed, so the plus/minus
    pair shares the noise realizations — common-random-numbers variance
    reduction on top of the exact shift rule."""
    from .dynamic import expectation_noisy

    fn = lambda c: expectation_noisy(
        c, terms, shots=shots, kind=kind, p1=p1, p2=p2, seed=seed,
        config=config)
    return parameter_shift(circuit, (), config, gate_indices, fn)
