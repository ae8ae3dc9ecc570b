"""Stochastic noise channels via trajectory unraveling (dynamic.Noise).

Ground truth: the DensitySimulator's exact channel action on the same
circuit.  Trajectory averages (batched ensembles) must converge to the
density populations for every NAMED_CHANNELS kind — this pins both the
Pauli-mixture probabilities and the amplitude-damping jump unraveling to
the Kraus conventions in density.py.
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.density import DensitySimulator, NoisyCircuit
from gpu_quantum_simulator_tpu.dynamic import (
    DynamicCircuit,
    Noise,
    _pauli_ensemble,
    run_dynamic,
    run_dynamic_batched,
)


def _density_populations(n, pre, kind, q, p, post):
    nc = NoisyCircuit(n, items=list(pre.gates))
    kw = {"gamma": p} if kind == "amplitude_damping" else {"p": p}
    nc.channel(kind, q, **kw)
    for g in post.gates:
        nc.items.append(g)
    return DensitySimulator().run(nc).probabilities()


def _trajectory_populations(n, pre, kind, q, p, post, shots, seed):
    dc = DynamicCircuit(n)
    dc.items.extend(pre.gates)
    dc.noise(kind, q, p)
    dc.items.extend(post.gates)
    acc = np.zeros(1 << n)
    for r in run_dynamic_batched(dc, shots=shots, seed=seed,
                                 return_states=True):
        acc += np.abs(r.state) ** 2
    return acc / shots


@pytest.mark.parametrize("kind,p", [
    ("depolarizing", 0.35),
    ("dephasing", 0.6),
    ("bit_flip", 0.3),
    ("amplitude_damping", 0.45),
])
def test_trajectory_average_matches_density(kind, p):
    n = 3
    pre = models.random_circuit(n, 20, seed=4)
    post = models.random_circuit(n, 20, seed=5)
    want = _density_populations(n, pre, kind, 1, p, post)
    got = _trajectory_populations(n, pre, kind, 1, p, post,
                                  shots=4096, seed=9)
    assert np.max(np.abs(got - want)) < 0.04     # Monte-Carlo tolerance


def test_amplitude_damping_decay_exact_rate():
    # |1> under gamma: P(0) = gamma exactly (in expectation)
    dc = DynamicCircuit(1)
    dc.x(0)
    dc.noise("amplitude_damping", 0, 0.3)
    acc = 0.0
    shots = 8192
    for r in run_dynamic_batched(dc, shots=shots, seed=2,
                                 return_states=True):
        acc += np.abs(r.state[0]) ** 2
    assert acc / shots == pytest.approx(0.3, abs=0.02)


def test_pauli_y_applied_exactly():
    # force the Y branch (u in [px, px+py)) and compare with dense Y
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    v = rng.normal(size=4) + 1j * rng.normal(size=4)
    v /= np.linalg.norm(v)
    re = jnp.asarray(v.real, jnp.float32)
    im = jnp.asarray(v.imag, jnp.float32)
    probs = jnp.asarray([0.2, 0.5, 0.1], jnp.float32)
    u = jnp.asarray([0.4], jnp.float32)           # lands in the Y window
    for q in (0, 1):
        nre, nim = _pauli_ensemble(re, im, q, 2, 0, probs, u)
        got = np.asarray(nre) + 1j * np.asarray(nim)
        Y = np.array([[0, -1j], [1j, 0]])
        full = np.kron(Y, np.eye(2)) if q == 1 else np.kron(np.eye(2), Y)
        np.testing.assert_allclose(got, full @ v, atol=1e-6)


def test_noise_per_shot_path_agrees():
    # run_dynamic (per-shot, host RNG) must produce the same average as
    # the batched path within Monte-Carlo error
    n = 2
    dc = DynamicCircuit(n)
    dc.h(0).cx(0, 1)
    dc.noise("depolarizing", 0, 0.5)
    acc = np.zeros(1 << n)
    shots = 600
    for r in run_dynamic(dc, shots=shots, seed=3, return_states=True):
        acc += np.abs(r.state) ** 2
    per_shot = acc / shots
    batched = _trajectory_populations(
        n, models.bell(), "depolarizing", 0, 0.5,
        models.random_circuit(n, 0, seed=0), shots=4096, seed=4)
    assert np.max(np.abs(per_shot - batched)) < 0.06


def test_with_noise_structure():
    from gpu_quantum_simulator_tpu.dynamic import with_noise

    c = models.bell()                       # h(0); cx(0,1)
    dc = with_noise(c, p1=0.01, p2=0.02)
    noises = [i for i in dc.items if isinstance(i, Noise)]
    assert len(noises) == 3                 # 1 after h + 2 after cx
    assert noises[0].p == 0.01 and noises[1].p == 0.02


def test_sample_noisy_matches_density_distribution():
    from gpu_quantum_simulator_tpu.dynamic import sample_noisy, with_noise

    n, p = 2, 0.25
    c = models.bell()
    # exact distribution: density sim with the same per-gate channels
    nc = NoisyCircuit(n)
    for item in with_noise(c, p1=p, p2=p).items:
        if isinstance(item, Noise):
            nc.channel("depolarizing", item.qubit, p=item.p)
        else:
            nc.items.append(item)
    want = DensitySimulator().run(nc).probabilities()

    shots = 8192
    samples = sample_noisy(c, shots, p1=p, p2=p, seed=6)
    got = np.bincount(samples, minlength=1 << n) / shots
    assert np.max(np.abs(got - want)) < 0.03


def test_sample_noisy_zero_noise_is_pure_sampling():
    from gpu_quantum_simulator_tpu.dynamic import sample_noisy

    c = models.ghz(3)
    samples = sample_noisy(c, 512, seed=1)
    u = set(np.unique(samples).tolist())
    assert u <= {0, 7}
    assert len(u) == 2


def test_noise_validation():
    dc = DynamicCircuit(2)
    with pytest.raises(ValueError):
        dc.noise("thermal", 0, 0.1)
    with pytest.raises(ValueError):
        dc.noise("dephasing", 0, 1.5)
    with pytest.raises(ValueError):
        dc.noise("dephasing", 5, 0.1)


def _density_for(dc_items, n):
    nc = NoisyCircuit(n)
    for item in dc_items:
        if isinstance(item, Noise):
            kw = {"gamma": item.p} if item.kind == "amplitude_damping" else {"p": item.p}
            nc.channel(item.kind, item.qubit, **kw)
        else:
            nc.items.append(item)
    return DensitySimulator().run(nc)


def test_expectation_noisy_matches_density_zz():
    from gpu_quantum_simulator_tpu.dynamic import expectation_noisy, with_noise

    p = 0.3
    c = models.bell()
    rho = _density_for(with_noise(c, p1=p, p2=p).items, 2)
    want = rho.expectation_z([0, 1])
    got = expectation_noisy(c, [(1.0, "Z0 Z1")], shots=8192, p1=p, p2=p, seed=3)
    assert got == pytest.approx(want, abs=0.03)


def test_expectation_noisy_matches_density_xx():
    from gpu_quantum_simulator_tpu.dynamic import expectation_noisy, with_noise

    p = 0.25
    c = models.bell()
    rho = _density_for(with_noise(c, p1=p, p2=p).items, 2)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    want = float(np.real(np.trace(rho.matrix() @ np.kron(X, X))))
    got = expectation_noisy(c, [(1.0, "X0 X1")], shots=8192, p1=p, p2=p, seed=5)
    assert got == pytest.approx(want, abs=0.03)


def test_expectation_noisy_zero_noise_exact():
    from gpu_quantum_simulator_tpu.dynamic import expectation_noisy
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    c = models.random_circuit(3, 30, seed=8)
    terms = [(0.7, "Z0"), (-0.4, "X1 Z2"), (0.25, "III")]
    want = expectation_pauli_sum(c, terms)
    got = expectation_noisy(c, terms, shots=8, seed=0)
    assert got == pytest.approx(want, abs=1e-5)


def test_depolarizing2_trajectory_matches_density():
    """Correlated 2q depolarizing: trajectory-averaged populations converge
    to the exact kraus_depolarizing2 channel action."""
    n = 3
    p = 0.5
    pre = models.random_circuit(n, 20, seed=14)
    post = models.random_circuit(n, 20, seed=15)
    nc = NoisyCircuit(n, items=list(pre.gates))
    nc.channel("depolarizing2", 0, 2, p=p)
    nc.items.extend(post.gates)
    want = DensitySimulator().run(nc).probabilities()

    dc = DynamicCircuit(n)
    dc.items.extend(pre.gates)
    dc.noise("depolarizing2", 0, p, qubit2=2)
    dc.items.extend(post.gates)
    shots = 4096
    acc = np.zeros(1 << n)
    for r in run_dynamic_batched(dc, shots=shots, seed=21,
                                 return_states=True):
        acc += np.abs(r.state) ** 2
    assert np.max(np.abs(acc / shots - want)) < 0.04


def test_depolarizing2_differs_from_independent_pairs():
    """The correlated channel is NOT the product of two independent 1q
    depolarizings: on a Bell pair the correlated error keeps <ZZ>
    correlations the independent model destroys faster."""
    n = 2
    p = 0.8
    bell = models.bell()
    # exact density: correlated vs independent
    nc_corr = NoisyCircuit(n, items=list(bell.gates))
    nc_corr.channel("depolarizing2", 0, 1, p=p)
    nc_ind = NoisyCircuit(n, items=list(bell.gates))
    nc_ind.channel("depolarizing", 0, p=p)
    nc_ind.channel("depolarizing", 1, p=p)
    pc = DensitySimulator().run(nc_corr).probabilities()
    pi = DensitySimulator().run(nc_ind).probabilities()
    assert np.max(np.abs(pc - pi)) > 0.02


def test_with_noise_correlated_emits_pair_events():
    from gpu_quantum_simulator_tpu.dynamic import with_noise

    c = models.bell()  # h(0); cx(0, 1)
    dc = with_noise(c, p1=0.01, p2=0.05, correlated=True)
    pair = [i for i in dc.items if isinstance(i, Noise)
            and i.kind == "depolarizing2"]
    assert len(pair) == 1 and {pair[0].qubit, pair[0].qubit2} == {0, 1}
    dc2 = with_noise(c, p1=0.01, p2=0.05)
    kinds = [i.kind for i in dc2.items if isinstance(i, Noise)]
    assert kinds.count("depolarizing") == 3  # 1q event + both cx qubits


def test_noise_validation_errors():
    dc = DynamicCircuit(3)
    with pytest.raises(ValueError):
        dc.noise("depolarizing2", 0, 0.1)              # missing qubit2
    with pytest.raises(ValueError):
        dc.noise("depolarizing", 0, 0.1, qubit2=1)     # qubit2 on 1q kind
    with pytest.raises(ValueError):
        dc.noise("depolarizing2", 1, 0.1, qubit2=1)    # identical qubits
    with pytest.raises(ValueError):
        dc.noise("depolarizing2", 0, 0.1, qubit2=7)    # out of range


def test_readout_error_flips():
    from gpu_quantum_simulator_tpu.dynamic import sample_noisy

    c = models.Circuit(2) if hasattr(models, "Circuit") else None
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(2)
    c.x(0)  # deterministic |01> -> index 1
    base = sample_noisy(c, 64, seed=3)
    assert set(base.tolist()) == {1}
    flipped = sample_noisy(c, 64, seed=3, readout_error=1.0)
    assert set(flipped.tolist()) == {2}  # both bits flip: 01 -> 10
    stat = sample_noisy(c, 4096, seed=3, readout_error=0.25)
    frac_changed = np.mean(stat != 1)
    assert abs(frac_changed - (1 - 0.75 ** 2)) < 0.05


def _random_kraus(dim, k, seed):
    """k Kraus operators of size dim via a random isometry (QR columns)."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(k * dim, dim)) + 1j * rng.normal(size=(k * dim, dim))
    q, _ = np.linalg.qr(a)      # (k*dim, dim), orthonormal columns
    return [q[m * dim:(m + 1) * dim, :] for m in range(k)]


def test_kraus_trajectory_matches_density_1q():
    n = 3
    ks = _random_kraus(2, 3, seed=7)
    pre = models.random_circuit(n, 15, seed=30)
    post = models.random_circuit(n, 15, seed=31)
    nc = NoisyCircuit(n, items=list(pre.gates))
    nc.channel(ks, 1)
    nc.items.extend(post.gates)
    want = DensitySimulator().run(nc).probabilities()

    dc = DynamicCircuit(n)
    dc.items.extend(pre.gates)
    dc.noise_kraus(ks, 1)
    dc.items.extend(post.gates)
    shots = 4096
    acc = np.zeros(1 << n)
    for r in run_dynamic_batched(dc, shots=shots, seed=41,
                                 return_states=True):
        acc += np.abs(r.state) ** 2
    assert np.max(np.abs(acc / shots - want)) < 0.04


def test_kraus_trajectory_matches_density_2q_unsorted():
    n = 3
    ks = _random_kraus(4, 2, seed=9)
    pre = models.random_circuit(n, 15, seed=32)
    nc = NoisyCircuit(n, items=list(pre.gates))
    nc.channel(ks, 2, 0)        # unsorted qubit order
    want = DensitySimulator().run(nc).probabilities()

    dc = DynamicCircuit(n)
    dc.items.extend(pre.gates)
    dc.noise_kraus(ks, 2, 0)
    shots = 8192
    acc = np.zeros(1 << n)
    for r in run_dynamic_batched(dc, shots=shots, seed=43,
                                 return_states=True):
        acc += np.abs(r.state) ** 2
    assert np.max(np.abs(acc / shots - want)) < 0.04


def test_kraus_unitary_channel_is_exact_per_shot():
    """A single unitary Kraus op must act deterministically (weight 1)."""
    from gpu_quantum_simulator_tpu.ir.gates import matrix_1q

    dc = DynamicCircuit(2)
    dc.h(0)
    dc.noise_kraus([matrix_1q("h")], 1)
    rs = run_dynamic_batched(dc, shots=4, seed=0, return_states=True)
    want = np.zeros(4, complex)
    want[:] = [0.5, 0.5, 0.5, 0.5]
    for r in rs:
        assert np.max(np.abs(r.state - want)) < 1e-6


def test_kraus_per_shot_unbatched_path():
    from gpu_quantum_simulator_tpu.dynamic import run_dynamic

    ks = _random_kraus(2, 2, seed=3)
    dc = DynamicCircuit(2)
    dc.h(0).cx(0, 1)
    dc.noise_kraus(ks, 0)
    rs = run_dynamic(dc, shots=3, seed=5, return_states=True)
    for r in rs:
        assert abs(np.linalg.norm(r.state) - 1) < 1e-5


def test_kraus_validation():
    dc = DynamicCircuit(2)
    with pytest.raises(ValueError):
        dc.noise_kraus([np.eye(2) * 2], 0)          # not trace-preserving
    with pytest.raises(ValueError):
        dc.noise_kraus([np.eye(4)], 0)              # shape mismatch
    with pytest.raises(ValueError):
        dc.noise_kraus([np.eye(2)], 0, 0)           # duplicate qubits
    with pytest.raises(ValueError):
        dc.noise_kraus([np.eye(2)], 5)              # out of range
    dc.noise_kraus([np.eye(2)], 1)                  # identity channel is fine
    with pytest.raises(ValueError):
        dc.to_qasm()                                # no QASM spelling


def test_thermal_trajectory_matches_density():
    """DynamicCircuit.thermal (Kraus trajectories) averages to the exact
    thermal channel: <Z> after relaxation from |+> and from |1>."""
    from gpu_quantum_simulator_tpu.density import DensitySimulator, NoisyCircuit
    from gpu_quantum_simulator_tpu.dynamic import DynamicCircuit, run_dynamic_batched

    t1, t2, t = 10.0, 12.0, 4.0
    gamma = 1 - np.exp(-t / t1)

    dc = DynamicCircuit(1)
    dc.x(0)
    dc.thermal(0, t1, t2, t)
    res = run_dynamic_batched(dc, shots=4096, seed=2, return_states=True)
    # <Z> = P0 - P1 = 1 - 2 e^{-t/T1} for a |1> start
    p1 = np.mean([np.abs(r.state[1]) ** 2 for r in res])
    assert abs(p1 - np.exp(-t / t1)) < 0.03

    nc = NoisyCircuit(1)
    nc.x(0)
    nc.channel("thermal", 0, t1=t1, t2=t2, time=t)
    rho = DensitySimulator().run(nc).matrix()
    assert abs(rho[1, 1].real - np.exp(-t / t1)) < 1e-6
