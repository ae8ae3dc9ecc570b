"""KAK (Cartan) decomposition of arbitrary 2q unitaries into native gates.

Exactness bar 1e-8 including global phase (the simulator reports
amplitudes, not density matrices — phases are observable content).
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.ir.decompose import (
    _gate_matrix_2q, emit_composite, emit_unitary, kak_decompose)


def _dense(c: Circuit) -> np.ndarray:
    total = np.eye(4, dtype=complex)
    for g in c.gates:
        total = _gate_matrix_2q(g, 0, 1) @ total
    return total


def _haar(rng) -> np.ndarray:
    z = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


def test_ryy_exact():
    th = 0.83
    Y = np.array([[0, -1j], [1j, 0]])
    YY = np.kron(Y, Y)
    want = np.cos(th / 2) * np.eye(4) - 1j * np.sin(th / 2) * YY
    c = Circuit(2)
    emit_composite(c, "ryy", (0, 1), (th,))
    assert np.max(np.abs(_dense(c) - want)) < 1e-12


def test_kak_random():
    rng = np.random.default_rng(0)
    for _ in range(60):
        u = _haar(rng)
        c = Circuit(2)
        emit_unitary(c, u, (0, 1))
        assert np.max(np.abs(_dense(c) - u)) < 1e-8


def test_kak_degenerate_classes():
    CNOT = np.eye(4, dtype=complex)
    CNOT[[1, 3], :] = CNOT[[3, 1], :]
    SWAP = np.eye(4, dtype=complex)[[0, 2, 1, 3]]
    H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    iSWAP = np.array([[1, 0, 0, 0], [0, 0, 1j, 0],
                      [0, 1j, 0, 0], [0, 0, 0, 1]], dtype=complex)
    for m in (np.eye(4, dtype=complex), CNOT, SWAP, np.kron(H, X), iSWAP,
              np.diag([1.0, 1, 1, -1]).astype(complex),
              np.exp(0.9j) * np.eye(4, dtype=complex)):
        c = Circuit(2)
        emit_unitary(c, m, (0, 1))
        assert np.max(np.abs(_dense(c) - m)) < 1e-8


def test_kak_rejects_nonunitary():
    with pytest.raises(ValueError, match="unitary"):
        kak_decompose(np.ones((4, 4)))
    with pytest.raises(ValueError, match="4x4"):
        kak_decompose(np.eye(3))


def test_circuit_unitary_method_through_engine():
    """Circuit.unitary drives the whole pipeline: amplitudes of the
    decomposed gates match applying the raw matrix, any qubit pair."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gpu_quantum_simulator_tpu import simulate

    rng = np.random.default_rng(3)
    u = _haar(rng)
    c = Circuit(3)
    c.h(0).h(1).h(2)
    c.unitary(u, 2, 0)          # reversed, non-adjacent operand order
    v = np.asarray(simulate(c, strategy="mxu"))

    # reference: build the 8x8 by hand (basis bit0=q0): u acts on (q2, q0)
    # with index = bit(q0)*2 + bit(q2)
    full = np.zeros((8, 8), dtype=complex)
    for col in range(8):
        b0, b1, b2 = col & 1, (col >> 1) & 1, (col >> 2) & 1
        vin = np.zeros(4, dtype=complex)
        vin[b0 * 2 + b2] = 1.0
        vout = u @ vin
        for k in range(4):
            nb2, nb0 = k & 1, (k >> 1) & 1
            full[nb0 | (b1 << 1) | (nb2 << 2), col] += vout[k]
    want = full @ (np.ones(8, dtype=complex) / np.sqrt(8))
    assert np.max(np.abs(v - want)) < 1e-6


def test_quantum_volume_cross_engine():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gpu_quantum_simulator_tpu import models, simulate
    from gpu_quantum_simulator_tpu.ref import simulate_reference

    c = models.quantum_volume(4, depth=3, seed=11)
    ref = simulate_reference(c)
    for strat in ("mxu", "fused4x4"):
        v = np.asarray(simulate(c, strategy=strat))
        assert np.max(np.abs(v - ref)) < 1e-5
    assert abs(np.vdot(ref, ref) - 1) < 1e-9


class TestQSD:
    """Quantum Shannon decomposition: k-qubit unitary synthesis (k >= 3),
    exact including global phase."""

    @staticmethod
    def _haar_k(rng, k):
        d = 1 << k
        z = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        q, r = np.linalg.qr(z)
        return q * (np.diag(r) / np.abs(np.diag(r)))

    def test_random_k3_k4(self):
        from gpu_quantum_simulator_tpu.ir.decompose import _dense_of_gates

        rng = np.random.default_rng(0)
        for k in (3, 4):
            for _ in range(3):
                u = self._haar_k(rng, k)
                c = Circuit(k)
                emit_unitary(c, u, tuple(range(k)))
                assert np.max(np.abs(
                    _dense_of_gates(c.gates, k) - u)) < 1e-7

    def test_degenerate_k3(self):
        from gpu_quantum_simulator_tpu.ir.decompose import _dense_of_gates

        ccx = np.eye(8, dtype=complex)
        ccx[[3, 7], :] = ccx[[7, 3], :]
        perm = np.eye(8, dtype=complex)[[0, 4, 1, 5, 2, 6, 3, 7]]
        for m in (ccx, perm, np.eye(8, dtype=complex)):
            c = Circuit(3)
            emit_unitary(c, m, (0, 1, 2))
            assert np.max(np.abs(_dense_of_gates(c.gates, 3) - m)) < 1e-7

    def test_through_engine_scattered_qubits(self):
        """QSD output drives the real pipeline on non-contiguous, permuted
        operands, against the CPU double reference."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        from gpu_quantum_simulator_tpu import simulate
        from gpu_quantum_simulator_tpu.ref import simulate_reference

        rng = np.random.default_rng(4)
        u = self._haar_k(rng, 3)
        c = Circuit(5)
        for q in range(5):
            c.h(q)
        c.unitary(u, 4, 0, 2)       # scrambled operand order
        v = np.asarray(simulate(c, strategy="mxu"))
        ref = simulate_reference(c)
        assert np.max(np.abs(v - ref)) < 1e-5

    def test_size_guards(self):
        with pytest.raises(ValueError, match="up to 6"):
            emit_unitary(Circuit(7), np.eye(128, dtype=complex),
                         tuple(range(7)))
        with pytest.raises(ValueError, match="unitary"):
            emit_unitary(Circuit(3), np.ones((8, 8)), (0, 1, 2))


class TestStatePrep:
    """Mottonen state preparation — Circuit.initialize, exact including
    global phase."""

    def test_random_states(self):
        from gpu_quantum_simulator_tpu.ir.decompose import _dense_of_gates

        rng = np.random.default_rng(0)
        for k in (1, 2, 3, 4):
            v = rng.standard_normal(1 << k) + 1j * rng.standard_normal(1 << k)
            v = v / np.linalg.norm(v)
            c = Circuit(k).initialize(v)
            got = _dense_of_gates(c.gates, k)[:, 0]
            assert np.max(np.abs(got - v)) < 1e-9

    def test_sparse_basis_and_normalization(self):
        from gpu_quantum_simulator_tpu.ir.decompose import _dense_of_gates

        v = np.zeros(8, dtype=complex)
        v[1] = 1j / np.sqrt(2)
        v[6] = -1 / np.sqrt(2)
        got = _dense_of_gates(Circuit(3).initialize(v).gates, 3)[:, 0]
        assert np.max(np.abs(got - v)) < 1e-9
        # unnormalized input normalizes; plain basis state lands exactly
        w = np.zeros(8)
        w[5] = 7.0
        got = _dense_of_gates(Circuit(3).initialize(w).gates, 3)[:, 0]
        assert abs(got[5] - 1) < 1e-9

    def test_through_engine_on_subset(self):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from gpu_quantum_simulator_tpu import simulate
        from gpu_quantum_simulator_tpu.ref import simulate_reference

        rng = np.random.default_rng(2)
        v = rng.standard_normal(4) + 1j * rng.standard_normal(4)
        v = v / np.linalg.norm(v)
        c = Circuit(4).initialize(v, 3, 1)   # non-adjacent subset
        got = np.asarray(simulate(c, strategy="mxu"))
        assert np.max(np.abs(got - simulate_reference(c))) < 1e-6
        # amplitude check: basis index bit3*? -> v[bit(q3) + 2*bit(q1)]
        for i, amp in enumerate(got):
            b3, b1 = (i >> 3) & 1, (i >> 1) & 1
            want = v[b3 + 2 * b1] if (i & ~0b1010) == 0 else 0.0
            assert abs(amp - want) < 1e-6

    def test_errors(self):
        with pytest.raises(ValueError, match="length"):
            Circuit(2).initialize(np.ones(3))
        with pytest.raises(ValueError, match="zero"):
            Circuit(2).initialize(np.zeros(4))
