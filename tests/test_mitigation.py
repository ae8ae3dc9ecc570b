"""Zero-noise extrapolation: folding exactness + mitigation accuracy."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.mitigation import folded, zne_expectation
from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum


def _ansatz(n=4, seed=2):
    rng = np.random.default_rng(seed)
    c = Circuit(n)
    for q in range(n):
        c.ry(rng.uniform(-0.9, 0.9), q)
    for q in range(n - 1):
        c.cx(q, q + 1)
    for q in range(n):
        c.rz(rng.uniform(-0.9, 0.9), q)
    return c


def test_folded_same_unitary_more_gates():
    from gpu_quantum_simulator_tpu import circuit_unitary

    c = _ansatz()
    for scale in (1, 3, 5):
        f = folded(c, scale)
        assert len(f.gates) == scale * len(c.gates)
        assert np.max(np.abs(circuit_unitary(f) - circuit_unitary(c))) < 1e-10
    with pytest.raises(ValueError):
        folded(c, 2)
    with pytest.raises(ValueError):
        folded(c, -1)


def test_zne_beats_raw_noisy_expectation():
    """Linear ZNE over fold scales (1,3,5) lands closer to the noiseless
    value than the unmitigated noisy estimate."""
    n = 4
    c = _ansatz(n)
    terms = [(-1.0, f"Z{i} Z{i + 1}") for i in range(n - 1)]
    terms += [(-0.6, f"X{i}") for i in range(n)]

    exact = expectation_pauli_sum(c, terms)
    mitigated, scales, raw = zne_expectation(
        c, terms, shots=4096, p1=0.02, seed=5, scales=(1, 3, 5),
        return_fits=True)
    noisy = raw[0]
    assert scales == [1, 3, 5]
    # the ladder is monotone toward more degradation
    assert abs(raw[2] - exact) > abs(raw[0] - exact)
    assert abs(mitigated - exact) < abs(noisy - exact)
    assert abs(mitigated - exact) < 0.25 * abs(noisy - exact) + 0.05


def test_zne_validations():
    c = _ansatz()
    with pytest.raises(ValueError):
        zne_expectation(c, [(1.0, "Z0")], scales=(1,), order=1)
