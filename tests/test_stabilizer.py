"""CHP stabilizer tableau engine (ref/stabilizer.py) — the independent
large-n correctness oracle — validated against the dense f64 reference."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
from gpu_quantum_simulator_tpu.ref.stabilizer import (
    StabilizerState, is_clifford_circuit, random_clifford_circuit)


def test_vs_dense_reference():
    rng = np.random.default_rng(0)
    for trial in range(12):
        n = int(rng.integers(2, 8))
        c = random_clifford_circuit(n, int(rng.integers(10, 80)), seed=trial)
        v = simulate_reference(c)
        p = np.abs(v) ** 2
        st = StabilizerState.from_circuit(c)
        for _ in range(4):
            k = int(rng.integers(1, n + 1))
            qs = rng.choice(n, size=k, replace=False)
            signs = np.ones(1 << n)
            for q in qs:
                signs *= 1 - 2 * ((np.arange(1 << n) >> q) & 1)
            want = float(np.sum(p * signs))
            assert abs(st.expectation_z([int(q) for q in qs]) - want) < 1e-9
        support = np.nonzero(p > 1e-12)[0]
        for mask, parity in st.z_parity_constraints():
            pc = [bin(int(s) & mask).count("1") % 2 for s in support]
            assert all(b == parity for b in pc)
        s = st.sample(400, seed=trial)
        assert set(s.tolist()) <= set(support.tolist())


def test_clifford_gate_set_and_rejection():
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(2)
    c.h(0).s(0).sdg(1).x(0).y(1).z(0).sx(0).sxdg(1).cx(0, 1)
    c.rz(np.pi / 2, 0)
    c.append("p", 1, params=(-np.pi,))
    assert is_clifford_circuit(c)
    v = simulate_reference(c)
    st = StabilizerState.from_circuit(c)
    p = np.abs(v) ** 2
    for q in range(2):
        want = float(np.sum(p * (1 - 2 * ((np.arange(4) >> q) & 1))))
        assert abs(st.expectation_z([q]) - want) < 1e-9
    c.rz(0.3, 0)
    assert not is_clifford_circuit(c)
    with pytest.raises(ValueError, match="not Clifford"):
        StabilizerState.from_circuit(c)


def test_ghz_predictions():
    from gpu_quantum_simulator_tpu import models

    n = 6
    st = StabilizerState.from_circuit(models.ghz(n))
    assert st.expectation_z([0]) == 0
    assert st.expectation_z([0, 3]) == 1         # perfect ZZ correlation
    cons = st.z_parity_constraints()
    # GHZ stabilizer group contains Z_i Z_j for all pairs -> n-1
    # independent even-parity constraints
    assert len(cons) == n - 1
    for mask, parity in cons:
        assert parity == 0
    s = st.sample(200, seed=1)
    assert set(s.tolist()) <= {0, (1 << n) - 1}


def test_cross_check_statevector_sampler():
    """The tableau validates the real device sampler: every sampled
    basis state must satisfy the stabilizer parity constraints and the
    per-qubit marginal classes {0, 1/2, 1}."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator

    c = random_clifford_circuit(9, 120, seed=7)
    st = StabilizerState.from_circuit(c)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    s = np.asarray(sim.sample(c, 3000, seed=2))
    for mask, parity in st.z_parity_constraints():
        pc = np.array([bin(int(v) & mask).count("1") % 2 for v in s])
        assert np.all(pc == parity)
    for q in range(9):
        ez = st.expectation_z([q])
        p1 = float(np.mean((s >> q) & 1))
        assert abs(p1 - (1 - ez) / 2) < 0.04, (q, ez, p1)
