"""QAOA MaxCut and Trotter-TFIM workload builders (models/circuits.py).

Cross-checks the gate-set decompositions (rz = diag(1, e^{i theta}),
reference phase convention) against dense numpy matrix exponentials, and
the (prefix, body, reps) parts against Simulator.run_device_iterated.
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.models.circuits import (
    maxcut_cost_terms,
    qaoa_maxcut,
    qaoa_maxcut_parts,
    ring_edges,
    trotter_tfim,
    trotter_tfim_parts,
)
from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

I2 = np.eye(2)
X = np.array([[0.0, 1.0], [1.0, 0.0]])
Z = np.diag([1.0, -1.0])


def _kron_at(op: np.ndarray, q: int, n: int) -> np.ndarray:
    """op on qubit q (bit q of the basis index, little-endian), identity
    elsewhere: kron runs highest qubit first so bit 0 is the fastest."""
    m = np.eye(1)
    for k in reversed(range(n)):
        m = np.kron(m, op if k == q else I2)
    return m


def _fidelity(a: np.ndarray, b: np.ndarray) -> float:
    return abs(np.vdot(a, b)) ** 2


def _exact_qaoa_state(n, edges, gammas, betas):
    dim = 1 << n
    v = np.full(dim, dim**-0.5, dtype=np.complex128)
    idx = np.arange(dim)
    cut = np.zeros(dim)
    for a, b in edges:
        cut += ((idx >> a) & 1) ^ ((idx >> b) & 1)
    for gamma, beta in zip(gammas, betas):
        v = np.exp(-1j * gamma * cut) * v
        mixer_1q = (np.cos(beta) * I2 - 1j * np.sin(beta) * X).astype(np.complex128)
        for q in range(n):
            v = _kron_at(mixer_1q, q, n) @ v
    return v


@pytest.mark.parametrize("layers", [1, 2])
def test_qaoa_state_matches_exact(layers):
    n = 5
    gammas = [0.7, 0.3][:layers]
    betas = [0.4, 0.9][:layers]
    c = qaoa_maxcut(n, gammas=gammas, betas=betas)
    got = simulate_reference(c)
    want = _exact_qaoa_state(n, ring_edges(n), gammas, betas)
    assert _fidelity(got, want) > 1 - 1e-12  # equal up to global phase


def test_qaoa_expectation_beats_plus_state():
    # At (gamma, beta) = (0.7, 0.4) on the 6-ring, <C> must exceed the
    # |+...+> baseline of |E|/2 = 3 (sanity that the phase/mixer do work
    # in the right direction), and match the dense computation.
    n = 6
    c = qaoa_maxcut(n, gammas=[0.7], betas=[0.4])
    terms = maxcut_cost_terms(n)
    got = expectation_pauli_sum(c, terms, SimulatorConfig(strategy="mxu"))
    v = _exact_qaoa_state(n, ring_edges(n), [0.7], [0.4])
    idx = np.arange(1 << n)
    cut = np.zeros(1 << n)
    for a, b in ring_edges(n):
        cut += ((idx >> a) & 1) ^ ((idx >> b) & 1)
    want = float(np.sum(np.abs(v) ** 2 * cut))
    assert got == pytest.approx(want, abs=1e-5)
    assert got > 0.5 * len(ring_edges(n)) + 0.3


def test_qaoa_parts_compose_to_full_circuit():
    n = 4
    prefix, body, layers = qaoa_maxcut_parts(n, gamma=0.5, beta=0.2, layers=3)
    unrolled = qaoa_maxcut(n, gammas=[0.5] * 3, betas=[0.2] * 3)
    composed = list(prefix.gates) + list(body.gates) * layers
    assert [g for g in composed] == list(unrolled.gates)


def _exact_tfim_state(n, t, J, g, periodic=False):
    dim = 1 << n
    H = np.zeros((dim, dim), dtype=np.complex128)
    bonds = [(i, i + 1) for i in range(n - 1)]
    if periodic and n > 2:
        bonds.append((n - 1, 0))
    for a, b in bonds:
        H -= J * (_kron_at(Z, a, n) @ _kron_at(Z, b, n))
    for q in range(n):
        H -= g * _kron_at(X, q, n)
    w, U = np.linalg.eigh(H)
    v0 = np.zeros(dim, dtype=np.complex128)
    v0[0] = 1.0
    return U @ (np.exp(-1j * w * t) * (U.conj().T @ v0))


@pytest.mark.parametrize("periodic", [False, True])
def test_trotter_tfim_converges_to_exact(periodic):
    n, J, g, t = 4, 1.0, 0.9, 0.5
    want = _exact_tfim_state(n, t, J, g, periodic)
    errs = []
    for steps in (5, 10, 20):
        c = trotter_tfim(n, dt=t / steps, J=J, g=g, steps=steps, periodic=periodic)
        got = simulate_reference(c)
        errs.append(1 - _fidelity(got, want))
    assert errs[0] < 2e-2  # already close at dt = 0.1
    # first-order Trotter: infidelity ~ O(dt^2) at fixed t
    assert errs[2] < errs[0] / 8


def test_trotter_parts_iterated_on_engine():
    n, steps = 4, 6
    prefix, body, _ = trotter_tfim_parts(n, dt=0.07, J=1.0, g=0.6, steps=steps)
    unrolled = trotter_tfim(n, dt=0.07, J=1.0, g=0.6, steps=steps)
    want = simulate_reference(unrolled)

    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, num_ops = sim.run_device_iterated(body, steps, prefix=prefix)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert _fidelity(got, want) > 1 - 1e-9
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_maxcut_cost_terms_on_basis_states():
    # <C> on a computational basis state is the literal cut size.
    n = 5
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    bits = 0b01101
    c = Circuit(n)
    for q in range(n):
        if (bits >> q) & 1:
            c.x(q)
    want = sum(((bits >> a) & 1) ^ ((bits >> b) & 1) for a, b in ring_edges(n))
    got = expectation_pauli_sum(c, maxcut_cost_terms(n), SimulatorConfig(strategy="reference"))
    assert got == pytest.approx(want, abs=1e-9)
