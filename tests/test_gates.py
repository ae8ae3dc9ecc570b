import math

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.ir import gates as G
from gpu_quantum_simulator_tpu.ir.circuit import Gate
from gpu_quantum_simulator_tpu.ir.oplist import (
    Op,
    compose,
    expand_unitary,
    gate_op,
    oplist_to_circuit_matrix,
    permute_basis,
)


_TEST_PARAMS = {"rz": (0.7,), "p": (0.7,), "ry": (0.7,), "rx": (0.7,), "u": (0.7, 0.3, -1.1)}


@pytest.mark.parametrize("name", G.SINGLE_QUBIT_GATES)
def test_unitarity(name):
    u = G.matrix_1q(name, _TEST_PARAMS.get(name, ()))
    assert np.allclose(u @ u.conj().T, np.eye(2), atol=1e-14)


def test_gate_identities():
    sx = G.matrix_1q("sx")
    assert np.allclose(sx @ sx, G.matrix_1q("x"))
    s = G.matrix_1q("s")
    assert np.allclose(s @ s, G.matrix_1q("z"))
    t = G.matrix_1q("t")
    assert np.allclose(t @ t, s)
    h = G.matrix_1q("h")
    assert np.allclose(h @ h, np.eye(2))
    assert np.allclose(G.matrix_1q("sdg"), s.conj().T)
    assert np.allclose(G.matrix_1q("tdg"), t.conj().T)


def test_rz_is_reference_phase_convention():
    # ref builds diag(1, e^{i theta}) — quantum_simulator.c:205-208
    theta = 1.234
    u = G.matrix_1q("rz", (theta,))
    assert u[0, 0] == 1.0 and u[0, 1] == 0 and u[1, 0] == 0
    assert u[1, 1] == pytest.approx(np.exp(1j * theta))
    # s == rz(pi/2), t == rz(pi/4) under this convention
    assert np.allclose(G.matrix_1q("s"), G.matrix_1q("rz", (math.pi / 2,)))
    assert np.allclose(G.matrix_1q("t"), G.matrix_1q("rz", (math.pi / 4,)))


def test_cnot_matrices():
    # control=low: |01> (hi=0,lo=1) -> |11>
    m = G.cnot_matrix(0, 1)
    v = np.zeros(4)
    v[0b01] = 1
    assert np.argmax(np.abs(m @ v)) == 0b11
    # control=high: |10> -> |11>
    m = G.cnot_matrix(1, 0)
    v = np.zeros(4)
    v[0b10] = 1
    assert np.argmax(np.abs(m @ v)) == 0b11
    # both are involutions
    for c, t in [(0, 1), (1, 0)]:
        m = G.cnot_matrix(c, t)
        assert np.allclose(m @ m, np.eye(4))


def test_tensor_pair_convention():
    x = G.matrix_1q("x")
    # X on low qubit of the pair: |00> -> |01> (index 1)
    m = G.tensor_1q_pair(x, np.eye(2))
    v = np.zeros(4)
    v[0] = 1
    assert np.argmax(np.abs(m @ v)) == 0b01
    # X on high qubit: |00> -> |10>
    m = G.tensor_1q_pair(np.eye(2), x)
    assert np.argmax(np.abs(m @ np.eye(4)[:, 0])) == 0b10


def test_permute_basis_swap():
    # swapping the two qubits of CNOT(control=low) gives CNOT(control=high)
    m = permute_basis(G.CNOT_CONTROL_LOW, [5, 9], [9, 5])
    assert np.allclose(m, G.CNOT_CONTROL_HIGH)
    # identity reorder
    assert np.allclose(permute_basis(m, [1, 2], [1, 2]), m)


def test_expand_unitary_matches_direct_application():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    # expand X on qubit 3 into set {1,3,4}: check action on basis states
    big = expand_unitary(G.matrix_1q("x"), [3], [1, 3, 4])
    # in the 3-qubit block basis (bit0=q1, bit1=q3, bit2=q4), X on q3 flips bit1
    for idx in range(8):
        v = np.zeros(8)
        v[idx] = 1
        assert np.argmax(np.abs(big @ v)) == idx ^ 0b010


def test_compose_order():
    # compose(later=X_q0, earlier=H_q0) == X @ H
    a = compose(gate_op(Gate("x", (0,))), gate_op(Gate("h", (0,))))
    assert np.allclose(a.u, G.matrix_1q("x") @ G.matrix_1q("h"))
    # cross-qubit compose: H on q0 then CX(0,1), against dense 2-qubit algebra
    c = compose(gate_op(Gate("cx", (0, 1))), gate_op(Gate("h", (0,))))
    expect = G.CNOT_CONTROL_LOW @ np.kron(np.eye(2), G.matrix_1q("h"))
    assert np.allclose(c.u, expect)


def test_oplist_to_circuit_matrix_bell():
    ops = [gate_op(Gate("h", (0,))), gate_op(Gate("cx", (0, 1)))]
    m = oplist_to_circuit_matrix(ops, 2)
    v = m @ np.eye(4)[:, 0]
    s = 1 / math.sqrt(2)
    assert np.allclose(v, [s, 0, 0, s], atol=1e-12)
