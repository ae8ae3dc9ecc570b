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
