import math

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.ref import cpu as REF

S = 1 / math.sqrt(2)


def test_bell_amplitudes():
    v = REF.simulate_reference(models.bell())
    assert np.allclose(v, [S, 0, 0, S], atol=1e-12)


def test_ghz():
    v = REF.simulate_reference(models.ghz(4))
    expect = np.zeros(16, dtype=complex)
    expect[0] = expect[15] = S
    assert np.allclose(v, expect, atol=1e-12)


def test_x_flips_correct_bit():
    # q[1] is bit 1 (little-endian, ref: mask = 1<<target)
    v = REF.simulate_reference(Circuit(3).x(1))
    assert np.argmax(np.abs(v)) == 0b010


def test_cnot_truth_table():
    # |01> (q0=1) --cx(0,1)--> |11>
    v = REF.simulate_reference(Circuit(2).x(0).cx(0, 1))
    assert np.argmax(np.abs(v)) == 0b11
    # control not set: no flip
    v = REF.simulate_reference(Circuit(2).x(1).cx(0, 1))
    assert np.argmax(np.abs(v)) == 0b10


def test_rz_phase():
    theta = 0.917
    v = REF.simulate_reference(Circuit(1).h(0).rz(theta, 0))
    assert v[0] == pytest.approx(S)
    assert v[1] == pytest.approx(S * np.exp(1j * theta))


def test_norm_preserved_deep_random():
    c = models.random_circuit(5, 300, seed=7)
    v = REF.simulate_reference(c)
    assert np.abs(np.vdot(v, v) - 1.0) < 1e-10


def test_qft_on_zero_is_uniform():
    n = 4
    v = REF.simulate_reference(models.qft(n))
    assert np.allclose(v, np.full(1 << n, 1 / math.sqrt(1 << n)), atol=1e-10)


def test_qft_matches_dft_matrix():
    # QFT|j> should have amplitudes omega^{jk}/sqrt(N) (bit-order: standard)
    n = 3
    N = 1 << n
    for j in [1, 5]:
        c = Circuit(n)
        for b in range(n):
            if (j >> b) & 1:
                c.x(b)
        qft_c = models.qft(n)
        c.gates.extend(qft_c.gates)
        v = REF.simulate_reference(c)
        w = np.exp(2j * np.pi * j * np.arange(N) / N) / math.sqrt(N)
        assert np.allclose(v, w, atol=1e-9), (j, v, w)


def test_cumulative_distribution_and_sampling():
    v = REF.simulate_reference(models.bell())
    cumul = REF.cumulative_distribution(v)
    assert cumul[-1] == pytest.approx(1.0)
    assert cumul[0] == pytest.approx(0.5)
    samples = REF.sample(v, 4000, rng=np.random.default_rng(0))
    # only |00> and |11> possible
    assert set(np.unique(samples)) <= {0, 3}
    frac = np.mean(samples == 0)
    assert 0.45 < frac < 0.55


def test_grover_3_18_is_normalized_and_peaked():
    c = models.load_reference_circuit("grover_3_18")
    v = REF.simulate_reference(c)
    assert np.abs(np.vdot(v, v) - 1.0) < 1e-9
    # grover_3_18 searches for basis states 3 and 18 (hence the filename);
    # probability concentrates ~0.5 on each
    p = np.abs(v) ** 2
    top2 = np.argsort(p)[-2:]
    assert set(top2.tolist()) == {3, 18}
    assert p[top2].sum() > 0.95
