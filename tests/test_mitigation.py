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


class TestReadoutMitigation:
    """Tensor-product inverse-confusion readout mitigation."""

    def test_symmetric_flips_on_ghz(self):
        import numpy as np
        import gpu_quantum_simulator_tpu as Q
        from gpu_quantum_simulator_tpu.dynamic import sample_noisy
        from gpu_quantum_simulator_tpu.sampling import counts

        n, p = 4, 0.08
        s = sample_noisy(Q.models.ghz(n), 40000, readout_error=p, seed=3)
        raw = np.bincount(np.asarray(s), minlength=1 << n) / len(s)
        mit = Q.mitigate_readout(s, n, p)
        ideal = np.zeros(1 << n)
        ideal[0] = ideal[-1] = 0.5
        assert np.max(np.abs(mit - ideal)) < 0.01
        assert (np.max(np.abs(mit - ideal))
                < 0.3 * np.max(np.abs(raw - ideal)))
        assert abs(mit.sum() - 1) < 1e-9
        # counts-dict input path is identical
        mit2 = Q.mitigate_readout(counts(s, n), n, p)
        assert np.max(np.abs(mit2 - mit)) < 1e-12

    def test_asymmetric_rates_invert_exactly(self):
        import numpy as np
        from gpu_quantum_simulator_tpu.mitigation import (
            mitigate_readout, readout_confusion_1q)

        rng = np.random.default_rng(0)
        true_p = rng.dirichlet(np.ones(8))
        p01 = [0.02, 0.05, 0.1]
        p10 = [0.04, 0.01, 0.07]
        meas = true_p.reshape(2, 2, 2)      # axes [bit2, bit1, bit0]
        for q, ax in ((0, 2), (1, 1), (2, 0)):
            A = readout_confusion_1q(p01[q], p10[q])
            meas = np.moveaxis(
                np.tensordot(A, np.moveaxis(meas, ax, 0), axes=(1, 0)),
                0, ax)
        cnt = {i: v for i, v in enumerate(
            np.round(meas.reshape(8) * 10_000_000).astype(int))}
        rec = mitigate_readout(cnt, 3, p01, p10)
        assert np.max(np.abs(rec - true_p)) < 1e-6

    def test_z_string_scaling(self):
        import gpu_quantum_simulator_tpu as Q
        assert abs(Q.mitigate_readout_expectation_z(0.5, 2, 0.1)
                   - 0.5 / 0.64) < 1e-12

    def test_guards(self):
        import pytest
        import gpu_quantum_simulator_tpu as Q
        with pytest.raises(ValueError, match="n <= 20"):
            Q.mitigate_readout([0], 21, 0.01)
        with pytest.raises(ValueError, match="0, 0.5"):
            Q.mitigate_readout([0, 1], 1, 0.6)
        with pytest.raises(ValueError, match="no samples"):
            Q.mitigate_readout({}, 2, 0.01)
