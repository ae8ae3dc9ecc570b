"""MPS engine: exact parity at small n, bounded-entanglement behavior at
widths far past the dense 2^30 ceiling, tracked truncation."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.mps import MPS, run_mps
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


def test_exact_parity_random_circuits():
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = int(rng.integers(3, 9))
        c = models.random_circuit(n, int(rng.integers(20, 120)), seed=trial)
        m = run_mps(c, max_bond=256)
        assert np.max(np.abs(m.to_statevector()
                             - simulate_reference(c))) < 1e-10


def test_exact_parity_qv():
    c = models.quantum_volume(7, depth=3, seed=2)
    m = run_mps(c, max_bond=64)
    assert np.max(np.abs(m.to_statevector()
                         - simulate_reference(c))) < 1e-9


def test_ghz_100_qubits():
    m = run_mps(models.ghz(100), max_bond=4)
    assert m.truncation_error < 1e-20
    assert m.max_bond_dim() == 2
    assert abs(m.amplitude(0) - 2 ** -0.5) < 1e-12
    assert abs(m.amplitude((1 << 100) - 1) - 2 ** -0.5) < 1e-12
    assert abs(m.entanglement_entropy(50) - 1.0) < 1e-10
    assert abs(m.expectation_pauli("Z0 Z99") - 1.0) < 1e-10
    s = m.sample(60, seed=1)
    assert set(s) <= {0, (1 << 100) - 1}
    assert 10 < sum(1 for v in s if v == 0) < 50


def test_amplitudes_and_pauli_vs_dense():
    c = models.random_circuit(8, 80, seed=5)
    m = run_mps(c, max_bond=256)
    v = simulate_reference(c)
    for idx in (0, 17, 255):
        assert abs(m.amplitude(idx) - v[idx]) < 1e-10
    P = {"X": np.array([[0, 1], [1, 0]]),
         "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}
    full = np.eye(1)
    ops = {0: "X", 3: "Z", 6: "Y"}
    for q in reversed(range(8)):
        full = np.kron(full, P[ops[q]] if q in ops else np.eye(2))
    want = float(np.real(np.vdot(v, full @ v)))
    assert abs(m.expectation_pauli("X0 Z3 Y6") - want) < 1e-10


def test_truncation_tracked_and_fidelity_monotone():
    c = models.quantum_volume(8, depth=4, seed=0)
    m4 = run_mps(c, max_bond=4)
    assert m4.truncation_error > 1e-4
    assert m4.norm() < 1.0
    v = simulate_reference(c)
    last = 0.0
    for chi in (2, 4, 8, 16):
        m = run_mps(c, max_bond=chi)
        f = abs(np.vdot(v, m.to_statevector())) ** 2 / m.norm()
        assert f > last - 1e-9
        last = f
    assert last > 1 - 1e-9     # chi=16 = exact for n=8


def test_trotter_entropy_growth_at_n40():
    """Shallow TFIM Trotter at n=40: entropy grows with time, bond stays
    modest, zero truncation at chi=64 — the regime MPS exists for."""
    n = 40
    terms = models.tfim_terms(n, J=1.0, g=1.0)
    last = -1.0
    for steps in (1, 3):
        c = models.pauli_evolution(n, terms, 0.15 * steps, steps=steps,
                                   order=2)
        m = run_mps(c, max_bond=64)
        assert m.truncation_error < 1e-12
        ent = m.entanglement_entropy(n // 2)
        assert ent > last
        last = ent
    assert 0.02 < last < 6.0


def test_guards():
    with pytest.raises(ValueError, match="n <= 20"):
        run_mps(models.ghz(24), max_bond=4).to_statevector()
    with pytest.raises(ValueError, match="cut"):
        run_mps(models.ghz(4)).entanglement_entropy(0)
    with pytest.raises(ValueError, match="max_bond"):
        MPS(3, max_bond=0)
