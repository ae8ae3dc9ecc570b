"""from_qiskit conversion: exercised via a duck-typed stand-in (qiskit is
an optional dependency and absent in CI); runs against the real qiskit
when installed."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.interop import from_qiskit
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


class _Op:
    def __init__(self, name, params=()):
        self.name = name
        self.params = list(params)


class _Bit:
    def __init__(self, index):
        self.index = index


class _Inst:
    def __init__(self, op, qubits):
        self.operation = op
        self.qubits = qubits


class _FakeQC:
    """Mimics qiskit >= 1.0 QuantumCircuit surface used by from_qiskit."""

    def __init__(self, n):
        self.num_qubits = n
        self.data = []
        self._bits = [_Bit(i) for i in range(n)]

    def find_bit(self, q):
        class _Loc:
            def __init__(self, index):
                self.index = index
        return _Loc(q.index)

    def add(self, name, *qubits, params=()):
        self.data.append(_Inst(_Op(name, params), [self._bits[q] for q in qubits]))


def test_conversion_parity():
    qc = _FakeQC(4)
    qc.add("h", 0)
    qc.add("cx", 0, 1)
    qc.add("rz", 2, params=(0.7,))
    qc.add("sx", 3)
    qc.add("swap", 1, 2)
    qc.add("barrier", 0)
    qc.add("u", 3, params=(0.1, 0.2, 0.3))
    c = from_qiskit(qc)

    want = Circuit(4)
    want.h(0)
    want.cx(0, 1)
    want.rz(0.7, 2)
    want.sx(3)
    from gpu_quantum_simulator_tpu.ir.decompose import emit_composite
    emit_composite(want, "swap", (1, 2))
    want.append("u", 3, params=(0.1, 0.2, 0.3))

    np.testing.assert_allclose(
        simulate_reference(c), simulate_reference(want), atol=1e-12)


def test_strict_and_dropped():
    qc = _FakeQC(2)
    qc.add("h", 0)
    qc.add("frobnicate", 1)
    with pytest.raises(ValueError, match="frobnicate"):
        from_qiskit(qc)
    dropped = []
    c = from_qiskit(qc, strict=False, dropped=dropped)
    assert dropped == ["frobnicate"]
    assert len(c.gates) == 1


def test_real_qiskit_roundtrip():
    qiskit = pytest.importorskip("qiskit")
    qc = qiskit.QuantumCircuit(3)
    qc.h(0)
    qc.cx(0, 1)
    qc.rz(0.5, 2)
    c = from_qiskit(qc)
    assert len(c.gates) == 3


class _CInst:
    def __init__(self, op, qubits, clbits=()):
        self.operation = op
        self.qubits = qubits
        self.clbits = clbits


class _FakeDynQC(_FakeQC):
    def __init__(self, n, m):
        super().__init__(n)
        self.num_clbits = m
        self._cbits = [_Bit(i) for i in range(m)]

    def add_measure(self, q, c):
        self.data.append(_CInst(_Op("measure"), [self._bits[q]],
                                [self._cbits[c]]))

    def add_reset(self, q):
        self.data.append(_CInst(_Op("reset"), [self._bits[q]]))

    def add_cond(self, name, q, clbit, value, params=()):
        op = _Op(name, params)
        op.condition = (self._cbits[clbit], value)
        self.data.append(_CInst(op, [self._bits[q]]))


def test_from_qiskit_dynamic_teleport_items():
    from gpu_quantum_simulator_tpu.dynamic import CondGate, Measure, Reset
    from gpu_quantum_simulator_tpu.interop import from_qiskit_dynamic

    qc = _FakeDynQC(3, 2)
    qc.add("h", 1)
    qc.add("cx", 1, 2)
    qc.add("cx", 0, 1)
    qc.add("h", 0)
    qc.add_measure(0, 0)
    qc.add_measure(1, 1)
    qc.add_cond("x", 2, 1, 1)
    qc.add_cond("z", 2, 0, 1)
    qc.add_reset(0)
    dc = from_qiskit_dynamic(qc)
    kinds = [type(i).__name__ for i in dc.items]
    assert kinds == ["Gate"] * 4 + ["Measure", "Measure",
                                    "CondGate", "CondGate", "Reset"]
    cg = [i for i in dc.items if isinstance(i, CondGate)]
    assert (cg[0].gate.name, cg[0].clbit) == ("x", 1)
    assert (cg[1].gate.name, cg[1].clbit) == ("z", 0)


def test_from_qiskit_dynamic_register_condition():
    from gpu_quantum_simulator_tpu.interop import from_qiskit_dynamic

    class _Reg(list):
        pass

    qc = _FakeDynQC(1, 1)
    op = _Op("x")
    op.condition = (_Reg([qc._cbits[0]]), 1)
    qc.data.append(_CInst(op, [qc._bits[0]]))
    dc = from_qiskit_dynamic(qc)
    assert dc.items[0].clbit == 0

    qc2 = _FakeDynQC(1, 2)
    op2 = _Op("x")
    op2.condition = (_Reg([qc2._cbits[0], qc2._cbits[1]]), 1)
    qc2.data.append(_CInst(op2, [qc2._bits[0]]))
    with pytest.raises(ValueError):
        from_qiskit_dynamic(qc2)


def test_from_qiskit_dynamic_control_flow_rejected():
    from gpu_quantum_simulator_tpu.interop import from_qiskit_dynamic

    qc = _FakeDynQC(1, 1)
    qc.data.append(_CInst(_Op("if_else"), [qc._bits[0]]))
    with pytest.raises(ValueError):
        from_qiskit_dynamic(qc)
    dropped = []
    dc = from_qiskit_dynamic(qc, strict=False, dropped=dropped)
    assert dropped == ["if_else"] and not dc.items


def test_unitary_instruction():
    """qiskit UnitaryGate converts via KAK (1q via zyz); >2q unitaries are
    rejected in strict mode and droppable otherwise."""
    rng = np.random.default_rng(5)
    z = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    u2q, _ = np.linalg.qr(z)
    z1 = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    u1q, _ = np.linalg.qr(z1)

    qc = _FakeQC(2)
    qc.add("h", 0)
    qc.add("unitary", 1, params=(u1q,))
    qc.add("unitary", 0, 1, params=(u2q,))
    c = from_qiskit(qc)

    want = Circuit(2)
    want.h(0)
    want.unitary(u1q, 1)
    want.unitary(u2q, 0, 1)
    assert np.max(np.abs(simulate_reference(c)
                         - simulate_reference(want))) < 1e-9

    # 3q unitaries now lower via the Shannon decomposition
    qc3 = _FakeQC(3)
    ccx = np.eye(8, dtype=complex)
    ccx[[3, 7], :] = ccx[[7, 3], :]
    qc3.add("x", 0)
    qc3.add("x", 1)
    qc3.add("unitary", 0, 1, 2, params=(ccx,))
    v = simulate_reference(from_qiskit(qc3))
    assert abs(abs(v[7]) - 1) < 1e-9      # |110> -> |111>

    qc7 = _FakeQC(7)
    qc7.add("unitary", *range(7), params=(np.eye(128, dtype=complex),))
    with pytest.raises(ValueError, match="unsupported"):
        from_qiskit(qc7)
    dropped = []
    from_qiskit(qc7, strict=False, dropped=dropped)
    assert dropped == ["unitary"]
