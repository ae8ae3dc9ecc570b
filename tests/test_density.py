"""Density-matrix simulation with noise channels (vectorized superoperators).

Physics-pinned checks: pure-state agreement, analytic channel action on
known states, trace preservation, purity decay, channel composition.
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.density import (
    DensitySimulator, NoisyCircuit, kraus_amplitude_damping,
    kraus_depolarizing, superoperator)
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

TOL = 1e-5


def _run(nc):
    return DensitySimulator(SimulatorConfig()).run(nc)


def test_pure_state_agreement():
    # no channels: rho must equal |psi><psi| from the state-vector engine
    for n in (2, 3, 5):
        c = models.grover_like(n, num_gates=60, seed=n)
        nc = NoisyCircuit(n, items=list(c.gates))
        rho = _run(nc).matrix()
        psi = simulate_reference(c)
        want = np.outer(psi, np.conj(psi))
        assert np.max(np.abs(rho - want)) < TOL


def test_trace_preserved_and_probabilities():
    nc = NoisyCircuit(3)
    nc.h(0).cx(0, 1).x(2)
    nc.channel("depolarizing", 1, p=0.3)
    res = _run(nc)
    p = res.probabilities()
    assert abs(p.sum() - 1.0) < TOL
    assert np.all(p > -TOL)


def test_dephasing_kills_coherence():
    # |+> fully dephased -> I/2 (off-diagonals 0, purity 1/2)
    nc = NoisyCircuit(1)
    nc.h(0)
    nc.channel("dephasing", 0, p=1.0)
    res = _run(nc)
    rho = res.matrix()
    assert abs(rho[0, 1]) < TOL and abs(rho[1, 0]) < TOL
    assert abs(res.purity() - 0.5) < TOL


def test_amplitude_damping_population():
    gamma = 0.37
    nc = NoisyCircuit(1)
    nc.x(0)
    nc.channel("amplitude_damping", 0, gamma=gamma)
    p = _run(nc).probabilities()
    assert abs(p[1] - (1 - gamma)) < TOL
    assert abs(p[0] - gamma) < TOL


def test_depolarizing_shrinks_bloch_vector():
    p = 0.4
    nc = NoisyCircuit(1)
    nc.h(0)                       # Bloch vector along +x
    nc.channel("depolarizing", 0, p=p)
    rho = _run(nc).matrix()
    # <X> = 2 Re rho_01 shrinks by exactly (1 - p)
    assert abs(2 * np.real(rho[0, 1]) - (1 - p)) < TOL


def test_channel_composition_matches_dense():
    # random 2-qubit circuit + channels vs direct superoperator algebra
    rng = np.random.default_rng(5)
    n = 2
    nc = NoisyCircuit(n)
    c = models.random_circuit(n, 30, seed=9)
    rho = np.zeros((4, 4), dtype=complex)
    rho[0, 0] = 1.0
    for g in c.gates:
        nc.items.append(g)
    nc.channel("bit_flip", 0, p=0.2)
    nc.channel("amplitude_damping", 1, gamma=0.15)

    # dense reference
    from gpu_quantum_simulator_tpu.ir.oplist import circuit_to_ops, op_matrix
    from gpu_quantum_simulator_tpu.ir.oplist import expand_unitary
    from gpu_quantum_simulator_tpu.density import (
        kraus_bit_flip)

    for op in circuit_to_ops(c):
        u, qs = op_matrix(op)
        big = expand_unitary(u, qs, (0, 1))
        rho = big @ rho @ big.conj().T
    for k in kraus_bit_flip(0.2):
        pass
    acc = np.zeros_like(rho)
    for k in kraus_bit_flip(0.2):
        big = expand_unitary(k, (0,), (0, 1))
        acc += big @ rho @ big.conj().T
    rho = acc
    acc = np.zeros_like(rho)
    for k in kraus_amplitude_damping(0.15):
        big = expand_unitary(k, (1,), (0, 1))
        acc += big @ rho @ big.conj().T
    rho = acc

    got = _run(nc).matrix()
    assert np.max(np.abs(got - rho)) < TOL


def test_prefetch_route_large_register():
    # n=6 -> 12 doubled qubits: exercises the prefetch planning route
    n = 6
    c = models.grover_like(n, num_gates=80, seed=3)
    nc = NoisyCircuit(n, items=list(c.gates))
    nc.channel("dephasing", 5, p=0.25)
    res = _run(nc)
    p = res.probabilities()
    assert abs(p.sum() - 1.0) < 2e-5
    # channel on one qubit cannot change that qubit's populations? (dephasing
    # is diagonal) — cross-check populations against the pure run
    psi = simulate_reference(c)
    pure = np.abs(psi) ** 2
    # dephasing leaves ALL populations unchanged
    assert np.max(np.abs(p - pure)) < 2e-5


def test_expectation_z_decay():
    # <Z> of |1> under amplitude damping: -1 -> -(1 - 2 gamma)... check sign
    gamma = 0.25
    nc = NoisyCircuit(2)
    nc.x(0)
    nc.channel("amplitude_damping", 0, gamma=gamma)
    res = _run(nc)
    assert abs(res.expectation_z([0]) - (2 * gamma - 1)) < TOL


def test_bad_kraus_rejected():
    nc = NoisyCircuit(1)
    with pytest.raises(ValueError, match="Kraus"):
        nc.channel([np.eye(2) * 0.5], 0)


def test_superoperator_identity():
    s = superoperator([np.eye(2, dtype=complex)])
    np.testing.assert_allclose(s, np.eye(4))


def test_density_inplace_halves_route():
    """The in-place split-half route (the 2n=30 path, forced small here via
    prefetch_inplace) matches the flat engine: probabilities, purity,
    matrix."""
    from gpu_quantum_simulator_tpu.config import SimulatorConfig

    n = 6  # 2n = 12 >= MIN_QUBITS: prefetch plans apply
    nc = NoisyCircuit(n)
    nc.h(0)
    for q in range(1, n):
        nc.cx(q - 1, q)
    nc.channel("depolarizing", 2, p=0.3)
    nc.channel("amplitude_damping", 4, gamma=0.2)
    flat = DensitySimulator(SimulatorConfig(prefetch_inplace=False)).run(nc)
    half = DensitySimulator(SimulatorConfig(prefetch_inplace=True)).run(nc)
    assert half.halves is not None and flat.halves is None
    np.testing.assert_allclose(half.probabilities(), flat.probabilities(),
                               atol=2e-6)
    assert abs(half.purity() - flat.purity()) < 2e-6
    np.testing.assert_allclose(half.matrix(), flat.matrix(), atol=2e-6)


def test_density_complex128_any_n():
    """complex128 density now runs beyond the old n<=4 cap (float64 XLA
    apply primitives) and agrees with the float32 engines."""
    from gpu_quantum_simulator_tpu.config import SimulatorConfig

    n = 6
    nc = NoisyCircuit(n)
    nc.h(0).cx(0, 1).cx(1, 2)
    nc.channel("dephasing", 1, p=0.5)
    nc.rz(0.7, 3)
    nc.channel("bit_flip", 5, p=0.25)
    f64 = DensitySimulator(SimulatorConfig(dtype="complex128")).run(nc)
    f32 = DensitySimulator().run(nc)
    p64, p32 = f64.probabilities(), f32.probabilities()
    assert abs(p64.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(p32, p64, atol=2e-6)
    assert abs(f64.purity() - f32.purity()) < 2e-6


def test_density_n15_rejected_for_complex128_only():
    from gpu_quantum_simulator_tpu.config import SimulatorConfig

    with pytest.raises(ValueError, match="n <= 15"):
        DensitySimulator().run(NoisyCircuit(16))
    with pytest.raises(ValueError, match="n <= 14"):
        DensitySimulator(SimulatorConfig(dtype="complex128")).run(
            NoisyCircuit(15))


def test_thermal_relaxation_channel():
    """kraus_thermal: coherence decays with T2, population with T1 —
    analytic single-qubit check, plus the unphysical-T2 guard."""
    import pytest

    from gpu_quantum_simulator_tpu.density import (
        DensitySimulator, NoisyCircuit, kraus_thermal)

    t1, t2, t = 10.0, 8.0, 3.0
    nc = NoisyCircuit(1)
    nc.h(0)
    nc.channel("thermal", 0, t1=t1, t2=t2, time=t)
    rho = DensitySimulator().run(nc).matrix()
    # |+><+|: populations stay 1/2 + gamma/2 shift, coherence = e^{-t/T2}/2
    gamma = 1 - np.exp(-t / t1)
    assert abs(rho[0, 1] - 0.5 * np.exp(-t / t2)) < 1e-6
    assert abs(rho[1, 1] - 0.5 * (1 - gamma)) < 1e-6
    assert abs(np.trace(rho) - 1.0) < 1e-6

    # population decay from |1>
    nc2 = NoisyCircuit(1)
    nc2.x(0)
    nc2.channel("thermal", 0, t1=t1, t2=t2, time=t)
    rho2 = DensitySimulator().run(nc2).matrix()
    assert abs(rho2[1, 1] - np.exp(-t / t1)) < 1e-6

    with pytest.raises(ValueError):
        kraus_thermal(1.0, 2.5, 0.1)      # T2 > 2 T1
    with pytest.raises(ValueError):
        kraus_thermal(-1.0, 0.5, 0.1)
