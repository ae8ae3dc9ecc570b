import numpy as np
import pytest

import jax.numpy as jnp

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu import sampling as S
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ops.apply import split_state
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


def _device_state(circuit):
    v = simulate_reference(circuit)
    return split_state(v)


def test_sample_direct_bell():
    re, im = _device_state(models.bell())
    s = S.sample_state_device(re, im, 2, 4000, seed=0)
    assert set(np.unique(s)) <= {0, 3}
    assert 0.45 < np.mean(s == 0) < 0.55


def test_sample_three_stage_matches_distribution():
    # force the large-n (group->row->column) path on a small, checkable state
    import jax

    import gpu_quantum_simulator_tpu.sampling as samp

    c = models.random_circuit(11, 160, seed=2)
    v = simulate_reference(c)
    re, im = split_state(v)
    idx = np.asarray(
        samp._sample_three_stage(re, im, 11, 40000, jax.random.PRNGKey(1)))
    p_emp = np.bincount(idx, minlength=1 << 11) / 40000
    p_true = np.abs(v) ** 2
    # total-variation distance small
    assert 0.5 * np.abs(p_emp - p_true).sum() < 0.08


def test_sample_three_stage_marginals_match():
    # per-qubit marginals of the sampled bitstrings match |amp|^2 exactly
    import jax

    import gpu_quantum_simulator_tpu.sampling as samp

    n = 12
    c = models.random_circuit(n, 200, seed=7)
    v = simulate_reference(c)
    re, im = split_state(v)
    idx = np.asarray(
        samp._sample_three_stage(re, im, n, 40000, jax.random.PRNGKey(3)))
    p_true = np.abs(v) ** 2
    for q in range(n):
        emp = np.mean((idx >> q) & 1)
        true = p_true[((np.arange(1 << n) >> q) & 1) == 1].sum()
        assert abs(emp - true) < 0.02, (q, emp, true)


def test_top_amplitudes_grover():
    c = models.load_reference_circuit("grover_3_18")
    re, im = _device_state(c)
    vals, idx = S.top_amplitudes_device(re, im, k=2)
    assert set(idx.tolist()) == {3, 18}
    assert np.all(vals > 0.49)


def test_norm_device():
    c = models.random_circuit(7, 100, seed=1)
    re, im = _device_state(c)
    assert abs(float(S.norm_device(re, im)) - 1.0) < 1e-5


def test_simulator_run_device_roundtrip():
    c = models.random_circuit(8, 80, seed=4)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device(c)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_halves_observables_match_flat():
    """expectation_z_halves / top_amplitudes_halves / amplitudes_halves on
    the split-half (n>=30) layout agree with flat-state reductions."""
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.sampling import (
        amplitudes_halves, expectation_z, expectation_z_halves,
        top_amplitudes_halves)

    n = 11
    c = models.grover_like(n, num_gates=250, seed=43)
    sim = Simulator(SimulatorConfig(strategy="prefetch", prefetch_inplace=True))
    parts, _ = sim.run_device_halves(c)

    flat = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    re = jnp.asarray(flat.real)
    im = jnp.asarray(flat.imag)

    for qubits in ([0], [7], [8], [3, 7, 10], list(range(n))):
        ez_h = expectation_z_halves(*parts, qubits, n)
        ez_f = expectation_z(re, im, qubits, n)
        assert abs(ez_h - ez_f) < 1e-5, (qubits, ez_h, ez_f)

    p = np.abs(flat) ** 2
    k = 6
    idx_h, p_h = top_amplitudes_halves(*parts, k=k, block_rows=2)
    order = np.argsort(p)[::-1][:k]
    assert np.allclose(np.sort(p_h), np.sort(p[order]), atol=1e-6)
    # each reported index really carries its reported probability (ties at
    # the rank-k boundary may swap equal-probability indices)
    assert np.allclose(p[idx_h], p_h, atol=1e-6)

    amps = amplitudes_halves(*parts, idx_h)
    assert np.max(np.abs(amps - flat[idx_h])) < 2e-5


def test_counts_helper():
    from gpu_quantum_simulator_tpu.sampling import counts

    s = np.array([0, 3, 3, 1, 3])
    assert counts(s, 2) == {"00": 1, "01": 1, "11": 3}
    assert counts(s, 2, as_bitstrings=False) == {0: 1, 1: 1, 3: 3}


def test_xeb_fidelity_ideal_vs_noise():
    """Linear XEB ~1 for faithful samples of a random circuit, ~0 for
    uniform noise samples scored against the same state."""
    from gpu_quantum_simulator_tpu.sampling import (
        sample_state_device, xeb_fidelity)

    n = 10
    c = models.random_circuit(n, 300, seed=5)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device(c)

    s_good = sample_state_device(re, im, n, 20000, seed=1)
    f_good = xeb_fidelity(re, im, s_good, n)
    assert abs(f_good - 1.0) < 0.12, f_good

    rng = np.random.default_rng(2)
    s_noise = rng.integers(0, 1 << n, size=20000)
    f_noise = xeb_fidelity(re, im, s_noise, n)
    assert abs(f_noise) < 0.08, f_noise
