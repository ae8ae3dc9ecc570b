"""Classical shadows vs exact expectations (statistical tolerances)."""

import numpy as np

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.shadows import (
    shadow_snapshots, shadows_expectation)


def test_shadows_ghz_observables():
    """One snapshot pool estimates every GHZ observable: <Z_i Z_j> = 1,
    <XXXX> = 1, <Z_0> = <X_0> = 0 (5-sigma statistical tolerances)."""
    c = models.ghz(4)
    pool = shadow_snapshots(c, 12000, seed=3)
    bases, outcomes = pool
    assert bases.shape == (12000, 4) and outcomes.shape == (12000,)
    assert set(np.unique(bases)) <= {0, 1, 2}

    est = lambda p: shadows_expectation(
        c, [(1.0, p)], _snapshot_data=pool)
    assert abs(est("Z0 Z1") - 1.0) < 0.15
    assert abs(est("Z1 Z3") - 1.0) < 0.15
    assert abs(est("XXXX") - 1.0) < 0.45
    assert abs(est("Z0")) < 0.1
    assert abs(est("X0")) < 0.1
    # identity passes through exactly; Hamiltonian sums share the pool
    h = shadows_expectation(
        c, [(0.5, "Z0 Z1"), (0.25, "XXXX"), (2.0, "IIII")],
        _snapshot_data=pool)
    assert abs(h - (0.5 + 0.25 + 2.0)) < 0.3


def test_shadows_random_state_matches_exact():
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    c = models.random_circuit(5, 60, seed=12)
    terms = [(1.0, "Z0 Z2"), (0.7, "X1"), (-0.5, "Y3 Z4")]
    exact = expectation_pauli_sum(c, terms)
    got = shadows_expectation(c, terms, snapshots=20000, seed=7)
    assert abs(got - exact) < 0.25, (got, exact)


def test_shadows_reduced_density_matrix():
    """Shadow tomography of small subsystems: GHZ reduced states are the
    classical mixture diag(1/2, 0, 0, 1/2); a product state's 1q reduced
    state matches the exact Bloch vector."""
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    from gpu_quantum_simulator_tpu.shadows import shadows_reduced_density

    c = models.ghz(4)
    bases, outcomes = shadow_snapshots(c, 20000, seed=11)
    rho = shadows_reduced_density(bases, outcomes, [0, 2])
    want = np.zeros((4, 4), dtype=complex)
    want[0, 0] = want[3, 3] = 0.5
    assert np.max(np.abs(rho - want)) < 0.12
    assert abs(np.trace(rho).real - 1.0) < 0.05
    assert np.max(np.abs(rho - rho.conj().T)) < 1e-12   # Hermitian by constr.

    c2 = Circuit(2)
    c2.ry(0.9, 0)
    b2, o2 = shadow_snapshots(c2, 20000, seed=12)
    r1 = shadows_reduced_density(b2, o2, [0])
    v = np.array([np.cos(0.45), np.sin(0.45)])
    want1 = np.outer(v, v).astype(complex)
    assert np.max(np.abs(r1 - want1)) < 0.06

    import pytest
    with pytest.raises(ValueError):
        shadows_reduced_density(b2, o2, [0, 0])
