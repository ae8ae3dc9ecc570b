import math

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.qasm.parser import QasmError, parse_qasm, parse_qasm_file


def test_bell_qasm_both_decl_forms():
    for decl in ("qubit[2] q;", "qubit q[2];", "qreg q[2];"):
        src = f'OPENQASM 3.0;\ninclude "stdgates.inc";\n{decl}\nh q[0];\ncx q[0], q[1];\n'
        c = parse_qasm(src)
        assert c.num_qubits == 2
        assert [g.name for g in c.gates] == ["h", "cx"]
        assert c.gates[1].qubits == (0, 1)


def test_reference_entanglement_file():
    c = parse_qasm_file("/root/reference/entanglement.qasm")
    assert c.num_qubits == 2
    assert [g.name for g in c.gates] == ["h", "cx"]


def test_reference_grover_file():
    # grover_3_18.qasm: 6 qubits, 2445 gates (1024 cx, 1212 rz, 174 sx, 35 x)
    c = parse_qasm_file("/root/reference/grover_3_18.qasm")
    assert c.num_qubits == 6
    counts = c.gate_counts()
    assert counts == {"cx": 1024, "rz": 1212, "sx": 174, "x": 35}
    assert len(c) == 2445


def test_rz_param_forms():
    c = parse_qasm("qubit[1] q; rz(1.5707963267948966) q[0]; rz(pi/2) q[0]; rz(-pi/4) q[0];")
    assert c.gates[0].params[0] == pytest.approx(math.pi / 2)
    assert c.gates[1].params[0] == pytest.approx(math.pi / 2)
    assert c.gates[2].params[0] == pytest.approx(-math.pi / 4)


def test_comments_and_whitespace():
    src = """
    // a comment
    OPENQASM 2.0;
    qreg q[3];
    h q[0]; // trailing
    barrier q[0];
    cx q[0] , q[2] ;
    """
    c = parse_qasm(src)
    assert [g.name for g in c.gates] == ["h", "cx"]
    assert c.gates[1].qubits == (0, 2)


def test_errors():
    with pytest.raises(QasmError):
        parse_qasm("h q[0];")  # gate before register
    with pytest.raises(QasmError):
        parse_qasm("qubit[2] q; foo q[0];")  # unknown gate
    with pytest.raises(QasmError):
        parse_qasm("qubit[2] q; cx q[0], q[5];")  # out of range
    with pytest.raises(QasmError):
        parse_qasm("qubit[2] q; cx q[1], q[1];")  # control == target
    with pytest.raises(QasmError):
        parse_qasm("qubit[2] q; h r[0];")  # unknown register


def test_roundtrip_to_qasm():
    c = parse_qasm_file("/root/reference/grover_3_18.qasm")
    c2 = parse_qasm(c.to_qasm())
    assert c2.num_qubits == c.num_qubits
    assert len(c2) == len(c)
    for a, b in zip(c.gates, c2.gates):
        assert a.name == b.name and a.qubits == b.qubits
        assert np.allclose(a.params, b.params)


# ------------------------------------------- parameter expression evaluator
def test_param_expressions():
    """The rz parameter language is evaluated by a recursive-descent parser
    (no eval): nested parens, unary chains, precedence, constants."""
    import math

    from gpu_quantum_simulator_tpu.qasm.parser import _eval_param

    cases = {
        "pi/2": math.pi / 2,
        "-3*pi/4": -3 * math.pi / 4,
        "(pi+1)/2": (math.pi + 1) / 2,
        "--2": 2.0,
        "-(-(2))": 2.0,
        "1+2*3": 7.0,
        "(1+2)*3": 9.0,
        ".5": 0.5,
        "2e3": 2000.0,
        "1-2-3": -4.0,
        "8/2/2": 2.0,
        "tau/4": math.tau / 4,
    }
    for expr, want in cases.items():
        assert abs(_eval_param(expr) - want) < 1e-12, expr


def test_param_expression_errors():
    import pytest

    from gpu_quantum_simulator_tpu.qasm.parser import QasmError, _eval_param

    for bad in ["", "pi/0", "2**3", "foo", "(pi", "1 2", "import os", "__x__"]:
        with pytest.raises(QasmError):
            _eval_param(bad)


def test_no_eval_in_package():
    """Security regression guard: the QASM front-end must not use eval."""
    import gpu_quantum_simulator_tpu.qasm.parser as P
    import inspect

    src = inspect.getsource(P)
    assert "eval(" not in src.replace("_eval_param(", "")


class TestDynamicSubset:
    def test_measure_both_dialects(self):
        from gpu_quantum_simulator_tpu.dynamic import Measure
        from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic

        src2 = """OPENQASM 2.0; qreg q[2]; creg c[2];
        h q[0]; cx q[0], q[1];
        measure q[0] -> c[0]; measure q[1] -> c[1];"""
        src3 = """OPENQASM 3.0; qubit[2] q; bit[2] c;
        h q[0]; cx q[0], q[1];
        c[0] = measure q[0]; c[1] = measure q[1];"""
        for src in (src2, src3):
            dc = parse_qasm_dynamic(src)
            ms = [i for i in dc.items if isinstance(i, Measure)]
            assert [(m.qubit, m.clbit) for m in ms] == [(0, 0), (1, 1)]
            assert dc.num_clbits == 2

    def test_dynamic_file_variant(self, tmp_path):
        from gpu_quantum_simulator_tpu import parse_qasm_dynamic_file
        from gpu_quantum_simulator_tpu.dynamic import Measure

        p = tmp_path / "t.qasm"
        p.write_text("OPENQASM 3.0; qubit[2] q; bit[1] c;\n"
                     "h q[0]; c[0] = measure q[0];\n")
        dc = parse_qasm_dynamic_file(str(p))
        assert dc.num_qubits == 2 and dc.num_clbits == 1
        assert any(isinstance(i, Measure) for i in dc.items)

    def test_reset_and_if(self):
        from gpu_quantum_simulator_tpu.dynamic import CondGate, Reset
        from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic

        dc = parse_qasm_dynamic("""OPENQASM 3.0; qubit[3] q; bit[2] c;
        x q[0]; c[0] = measure q[0]; reset q[0];
        if (c[0] == 1) x q[1];
        if (c[1]) z q[2];""")
        kinds = [type(i).__name__ for i in dc.items]
        assert kinds == ["Gate", "Measure", "Reset", "CondGate", "CondGate"]
        cg = [i for i in dc.items if isinstance(i, CondGate)]
        assert (cg[0].clbit, cg[0].value, cg[0].gate.name) == (0, 1, "x")
        assert (cg[1].clbit, cg[1].value, cg[1].gate.name) == (1, 1, "z")

    def test_roundtrip_teleportation(self):
        import numpy as np

        from gpu_quantum_simulator_tpu.dynamic import (
            DynamicCircuit, run_dynamic_batched)
        from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic

        dc = DynamicCircuit(3, num_clbits=2)
        dc.rz(1.234, 0)
        dc.sx(0)
        dc.h(1).cx(1, 2)
        dc.cx(0, 1).h(0)
        dc.measure(0, 0)
        dc.measure(1, 1)
        dc.c_if(1, "x", 2)
        dc.c_if(0, "z", 2)
        dc2 = parse_qasm_dynamic(dc.to_qasm())
        assert dc2.items == dc.items
        assert dc2.num_clbits == dc.num_clbits
        a = run_dynamic_batched(dc, shots=8, seed=1, return_states=True)
        b = run_dynamic_batched(dc2, shots=8, seed=1, return_states=True)
        for x, y in zip(a, b):
            assert x.clbits == y.clbits
            assert np.max(np.abs(x.state - y.state)) < 1e-6

    def test_noise_has_no_qasm_spelling(self):
        import pytest

        from gpu_quantum_simulator_tpu.dynamic import DynamicCircuit

        dc = DynamicCircuit(1)
        dc.noise("dephasing", 0, 0.1)
        with pytest.raises(ValueError):
            dc.to_qasm()

    def test_whole_register_condition_needs_one_bit(self):
        import pytest

        from gpu_quantum_simulator_tpu.qasm.parser import (
            QasmError, parse_qasm_dynamic)

        parse_qasm_dynamic(
            "qreg q[1]; creg c[1]; measure q[0] -> c[0]; if (c == 1) x q[0];")
        with pytest.raises(QasmError):
            parse_qasm_dynamic(
                "qreg q[1]; creg c[2]; measure q[0] -> c[0]; if (c == 1) x q[0];")


# --------------------------------------------------------- composite gates


def _circuit_unitary(c):
    """Dense unitary of a small circuit via the f64 reference engine."""
    import numpy as np
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    dim = 1 << c.num_qubits
    cols = []
    for j in range(dim):
        e = np.zeros(dim, dtype=np.complex128)
        e[j] = 1.0
        cols.append(simulate_reference(c, initial=e))
    return np.stack(cols, axis=1)


def _ctrl(u, dim=4):
    """Controlled-U with control = LOW qubit (bit 0), target = bit 1."""
    import numpy as np

    m = np.eye(dim, dtype=complex)
    # basis |b1 b0>: control bit0==1 -> rows/cols 1 and 3
    idx = [1, 3]
    for i, a in enumerate(idx):
        for j, b in enumerate(idx):
            m[a, b] = u[i, j]
    return m


def test_composite_matrices_exact():
    """Every parameterized composite lowers to the exact qelib1 matrix
    (including global phase)."""
    import numpy as np
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    from gpu_quantum_simulator_tpu.ir.decompose import (
        COMPOSITE_GATES, emit_composite)

    th, ph, lam = 0.7, -1.1, 0.4
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    RZ = np.diag([np.exp(-0.5j * lam), np.exp(0.5j * lam)])
    RX = np.array([[np.cos(lam / 2), -1j * np.sin(lam / 2)],
                   [-1j * np.sin(lam / 2), np.cos(lam / 2)]])
    RY = np.array([[np.cos(lam / 2), -np.sin(lam / 2)],
                   [np.sin(lam / 2), np.cos(lam / 2)]])
    U3 = np.array([[np.cos(th / 2), -np.exp(1j * lam) * np.sin(th / 2)],
                   [np.exp(1j * ph) * np.sin(th / 2),
                    np.exp(1j * (ph + lam)) * np.cos(th / 2)]])
    U2 = np.array([[1, -np.exp(1j * lam)],
                   [np.exp(1j * ph), np.exp(1j * (ph + lam))]]) / np.sqrt(2)
    P = np.diag([1, np.exp(1j * lam)])

    want = {
        ("cy", ()): _ctrl(Y),
        ("ch", ()): _ctrl(H),
        ("crz", (lam,)): _ctrl(RZ),
        ("crx", (lam,)): _ctrl(RX),
        ("cry", (lam,)): _ctrl(RY),
        ("cp", (lam,)): _ctrl(P),
        ("cu1", (lam,)): _ctrl(P),
        ("cu3", (th, ph, lam)): _ctrl(U3),
        # qelib1 rzz: phase e^{i theta} on odd-parity states
        ("rzz", (lam,)): np.diag([1, np.exp(1j * lam), np.exp(1j * lam), 1]),
        ("u1", (lam,)): P,
        ("u2", (ph, lam)): U2,
        ("u3", (th, ph, lam)): U3,
    }
    # rxx: exp(-i theta/2 XX) up to qelib1's global-phase choice — compare
    # against the explicitly computed qelib1 body product instead
    for (name, params), m in want.items():
        arity = COMPOSITE_GATES[name][0]
        c = Circuit(arity)
        emit_composite(c, name, tuple(range(arity)), params)
        got = _circuit_unitary(c)
        assert np.max(np.abs(got - m)) < 1e-12, name

    # rxx must equal exp(-i theta/2 X(x)X) up to a global phase, and be
    # deterministic in that phase (pin it by one matrix element)
    c = Circuit(2)
    emit_composite(c, "rxx", (0, 1), (lam,))
    got = _circuit_unitary(c)
    XX = np.kron(X, X)
    ideal = (np.cos(lam / 2) * np.eye(4) - 1j * np.sin(lam / 2) * XX)
    phase = got[0, 0] / ideal[0, 0]
    assert abs(abs(phase) - 1) < 1e-12
    assert np.max(np.abs(got - phase * ideal)) < 1e-12

    # cswap = Fredkin (control = qubit 0)
    c = Circuit(3)
    emit_composite(c, "cswap", (0, 1, 2), ())
    got = _circuit_unitary(c)
    m = np.eye(8, dtype=complex)
    # control bit0=1: swap bits 1 and 2 -> exchange |011> <-> |101> (3 <-> 5)
    m[3, 3] = m[5, 5] = 0
    m[3, 5] = m[5, 3] = 1
    assert np.max(np.abs(got - m)) < 1e-12


def test_parse_composite_with_params():
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    src = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
h q[0];
crz(pi/3) q[0],q[1];
cu1(0.25) q[1],q[2];
rzz(pi/7) q[0],q[2];
cy q[2],q[0];
u2(0.1,0.2) q[1];
"""
    c = parse_qasm(src)
    state = simulate_reference(c)
    assert abs(np.linalg.norm(state) - 1) < 1e-12


# ------------------------------------------------------ user gate definitions


def test_user_gate_definition_expands():
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    src = """OPENQASM 2.0;
gate majority a,b,c { cx c,b; cx c,a; ccx a,b,c; }
gate phased(theta) a { h a; rz(theta/2) a; h a; }
qreg q[3];
x q[0];
majority q[0],q[1],q[2];
phased(pi/2) q[1];
"""
    c = parse_qasm(src)
    want = Circuit(3)
    want.x(0)
    want.cx(2, 1)
    want.cx(2, 0)
    from gpu_quantum_simulator_tpu.ir.decompose import emit_composite
    emit_composite(want, "ccx", (0, 1, 2))
    want.h(1)
    want.rz(np.pi / 4, 1)
    want.h(1)
    got = simulate_reference(c)
    exp = simulate_reference(want)
    assert np.max(np.abs(got - exp)) < 1e-12


def test_user_gates_nest_and_shadow():
    """Definitions may call earlier definitions; a user def of a builtin
    name wins over the builtin."""
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    src = """OPENQASM 2.0;
gate myu1(lambda) q { rz(lambda) q; }
gate mycp(lambda) a,b { myu1(lambda/2) a; cx a,b; myu1(-lambda/2) b; cx a,b; myu1(lambda/2) b; }
gate cz a,b { mycp(pi) a,b; }
qreg q[2];
h q[0]; h q[1];
cz q[0],q[1];
"""
    c = parse_qasm(src)
    want = Circuit(2)
    want.h(0)
    want.h(1)
    want.rz(np.pi / 2, 0)
    want.cx(0, 1)
    want.rz(-np.pi / 2, 1)
    want.cx(0, 1)
    want.rz(np.pi / 2, 1)
    assert np.max(np.abs(simulate_reference(c) - simulate_reference(want))) < 1e-12


def test_inline_qelib1_style_defs():
    """qelib1.inc-style bodies written in terms of U/CX parse and match the
    native gates exactly."""
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    src = """OPENQASM 2.0;
gate myu3(theta,phi,lambda) q { U(theta,phi,lambda) q; }
gate myrx(theta) a { myu3(theta,-pi/2,pi/2) a; }
gate mycnot c,t { CX c,t; }
qreg q[2];
myrx(0.37) q[0];
mycnot q[0],q[1];
"""
    c = parse_qasm(src)
    want = Circuit(2)
    want.rx(0.37, 0)
    want.cx(0, 1)
    assert np.max(np.abs(simulate_reference(c) - simulate_reference(want))) < 1e-12


def test_opaque_rejected_and_recursion_bounded():
    import pytest
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm, QasmError

    with pytest.raises(QasmError, match="opaque"):
        parse_qasm('OPENQASM 2.0;\nopaque magic a,b;\nqreg q[2];\n')
    src = """OPENQASM 2.0;
gate loop a { loop a; }
qreg q[1];
loop q[0];
"""
    with pytest.raises(QasmError, match="deep"):
        parse_qasm(src)


def test_dynamic_parser_user_gates_and_if():
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic
    from gpu_quantum_simulator_tpu.dynamic import CondGate

    src = """OPENQASM 3.0;
gate flip2 a,b { x a; x b; }
qubit[3] q;
bit[1] c;
h q[0];
c[0] = measure q[0];
if (c[0] == 1) flip2 q[1],q[2];
"""
    dc = parse_qasm_dynamic(src)
    conds = [i for i in dc.items if isinstance(i, CondGate)]
    assert len(conds) == 2
    assert {cg.gate.qubits[0] for cg in conds} == {1, 2}


def test_register_broadcast_gates():
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    src = "OPENQASM 2.0;\nqreg q[3];\nh q;\nrz(pi/8) q;\nx q[1];\n"
    c = parse_qasm(src)
    want = Circuit(3)
    for k in range(3):
        want.h(k)
    for k in range(3):
        want.rz(np.pi / 8, k)
    want.x(1)
    assert np.max(np.abs(simulate_reference(c) - simulate_reference(want))) < 1e-12


def test_register_broadcast_user_gate():
    import numpy as np
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    src = """OPENQASM 2.0;
gate hz a { h a; z a; }
qreg q[2];
hz q;
"""
    c = parse_qasm(src)
    want = Circuit(2)
    want.h(0)
    want.z(0)
    want.h(1)
    want.z(1)
    assert np.max(np.abs(simulate_reference(c) - simulate_reference(want))) < 1e-12


def test_dynamic_broadcast_measure_reset():
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic, QasmError
    from gpu_quantum_simulator_tpu.dynamic import Measure, Reset
    import pytest

    src = "OPENQASM 3.0;\nqubit[3] q;\nbit[3] c;\nh q[0];\nc = measure q;\nreset q;\n"
    dc = parse_qasm_dynamic(src)
    ms = [i for i in dc.items if isinstance(i, Measure)]
    rs = [i for i in dc.items if isinstance(i, Reset)]
    assert [(m.qubit, m.clbit) for m in ms] == [(0, 0), (1, 1), (2, 2)]
    assert [r.qubit for r in rs] == [0, 1, 2]
    # QASM2 arrow dialect
    src2 = "OPENQASM 2.0;\nqreg q[2];\ncreg c[2];\nmeasure q -> c;\n"
    dc2 = parse_qasm_dynamic(src2)
    assert sum(isinstance(i, Measure) for i in dc2.items) == 2
    # classical register too small
    with pytest.raises(QasmError, match="too small"):
        parse_qasm_dynamic(
            "OPENQASM 2.0;\nqreg q[3];\ncreg c[1];\nmeasure q -> c;\n")


class TestQasm3Modifiers:
    """inv @ / pow(k) @ / ctrl(n) @ / negctrl(n) @ lower exactly (global
    phase included): 1q gates via p(gamma)+cu3 ZYZ, cx via ccx."""

    @staticmethod
    def _u(src, n):
        import gpu_quantum_simulator_tpu as Q
        c = Q.parse_qasm(f"OPENQASM 3.0; qubit[{n}] q; {src}")
        return Q.circuit_unitary(c)

    @staticmethod
    def _controlled(u, c_bit, t_bit, n, neg=False):
        import numpy as np
        N = 1 << n
        m = np.eye(N, dtype=complex)
        want = 0 if neg else 1
        for col in range(N):
            if ((col >> c_bit) & 1) != want:
                continue
            t0 = col & ~(1 << t_bit)
            t1 = col | (1 << t_bit)
            tb = (col >> t_bit) & 1
            m[:, col] = 0
            m[t0, col] = u[0, tb]
            m[t1, col] = u[1, tb]
        return m

    def test_ctrl_matches_dense(self):
        import numpy as np
        from gpu_quantum_simulator_tpu.ir.gates import matrix_1q
        for name, params, src in [
            ("x", (), "ctrl @ x q[0], q[1];"),
            ("z", (), "ctrl @ z q[0], q[1];"),
            ("sx", (), "ctrl @ sx q[0], q[1];"),
            ("rz", (0.7,), "ctrl @ rz(0.7) q[0], q[1];"),
            ("u", (0.5, 1.2, -0.9), "ctrl @ u(0.5, 1.2, -0.9) q[0], q[1];"),
            ("s", (), "ctrl @ s q[0], q[1];"),
        ]:
            got = self._u(src, 2)
            want = self._controlled(matrix_1q(name, params), 0, 1, 2)
            assert np.max(np.abs(got - want)) < 1e-9, name

    def test_negctrl_and_reversed_operands(self):
        import numpy as np
        from gpu_quantum_simulator_tpu.ir.gates import matrix_1q
        got = self._u("negctrl @ x q[1], q[0];", 2)
        want = self._controlled(matrix_1q("x", ()), 1, 0, 2, neg=True)
        assert np.max(np.abs(got - want)) < 1e-9

    def test_ctrl2_and_nesting_equal_ccx(self):
        import numpy as np
        a = self._u("ctrl(2) @ x q[0], q[1], q[2];", 3)
        b = self._u("ctrl @ ctrl @ x q[0], q[1], q[2];", 3)
        c = self._u("ccx q[0], q[1], q[2];", 3)
        assert np.max(np.abs(a - c)) < 1e-9
        assert np.max(np.abs(b - c)) < 1e-9

    def test_ctrl_of_cx_is_toffoli(self):
        import numpy as np
        a = self._u("ctrl @ cx q[2], q[0], q[1];", 3)
        b = self._u("ccx q[2], q[0], q[1];", 3)
        assert np.max(np.abs(a - b)) < 1e-9

    def test_inv_and_pow(self):
        import numpy as np
        assert np.max(np.abs(self._u("inv @ s q[0];", 1)
                             - self._u("sdg q[0];", 1))) < 1e-12
        assert np.max(np.abs(self._u("pow(3) @ t q[0];", 1)
                             - np.diag([1, np.exp(3j * np.pi / 4)]))) < 1e-12
        assert np.max(np.abs(self._u("pow(-2) @ s q[0];", 1)
                             - np.diag([1, np.exp(-1j * np.pi)]))) < 1e-12
        assert np.max(np.abs(self._u("pow(0) @ h q[0];", 1)
                             - np.eye(2))) < 1e-12
        # inv distributes over a multi-gate composite target
        assert np.max(np.abs(self._u("inv @ swap q[0], q[1];", 2)
                             - self._u("swap q[0], q[1];", 2))) < 1e-12

    def test_fractional_pow(self):
        import numpy as np
        from gpu_quantum_simulator_tpu.ir.gates import matrix_1q
        # principal sqrt of X IS sx (eigenvalues {1, i}), exact
        got = self._u("pow(0.5) @ x q[0];", 1)
        assert np.max(np.abs(got - matrix_1q("sx", ()))) < 1e-12
        # cube root of z composes back to z, global phase included
        r = self._u("pow(1/3) @ z q[0];", 1)
        assert np.max(np.abs(r @ r @ r - matrix_1q("z", ()))) < 1e-12
        # fractional power of a gate with a nontrivial global phase
        y3 = self._u("pow(0.3) @ y q[0];", 1)
        w, v = np.linalg.eig(matrix_1q("y", ()))
        want = (v * (w.astype(complex) ** 0.3)) @ np.linalg.inv(v)
        assert np.max(np.abs(y3 - want)) < 1e-12

    def test_modifier_errors(self):
        from gpu_quantum_simulator_tpu.qasm.parser import QasmError
        for src in [
            "pow(0.5) @ cx q[0], q[1];",       # fractional multi-qubit
            "pow(0.5) @ swap q[0], q[1];",     # fractional multi-gate
            "ctrl @ x q[0], q[0];",            # control overlaps target
            "ctrl(2) @ x q[0], q[1];",         # not enough operands
            "ctrl @ x q, q[1];",               # bare-register control
            "inv(2) @ x q[0];",                # inv takes no argument
        ]:
            with pytest.raises(QasmError):
                self._u(src, 2)


class TestGphase:
    """OpenQASM 3 gphase: bare = e^{ig} I (real amplitude content for a
    state-vector simulator); ctrl(n) @ gphase = the multi-controlled
    phase; negctrl levels conjugate their own control."""

    _u = staticmethod(TestQasm3Modifiers._u)

    def test_bare_and_inv_pow(self):
        import numpy as np
        g = 0.7
        assert np.max(np.abs(self._u("gphase(0.7);", 1)
                             - np.exp(1j * g) * np.eye(2))) < 1e-9
        assert np.max(np.abs(self._u("inv @ gphase(0.7);", 1)
                             - np.exp(-1j * g) * np.eye(2))) < 1e-9
        assert np.max(np.abs(self._u("pow(2) @ gphase(0.7);", 1)
                             - np.exp(2j * g) * np.eye(2))) < 1e-9

    def test_controlled(self):
        import numpy as np
        g = 0.7
        assert np.max(np.abs(self._u("ctrl @ gphase(0.7) q[0];", 1)
                             - np.diag([1, np.exp(1j * g)]))) < 1e-9
        want = np.diag([1, 1, 1, np.exp(1j * g)])
        assert np.max(np.abs(
            self._u("ctrl(2) @ gphase(0.7) q[0], q[1];", 2) - want)) < 1e-9
        assert np.max(np.abs(self._u("negctrl @ gphase(0.7) q[0];", 1)
                             - np.diag([np.exp(1j * g), 1]))) < 1e-9
        w2 = np.diag([np.exp(1j * g), 1, 1, 1])
        assert np.max(np.abs(
            self._u("negctrl(2) @ gphase(0.7) q[0], q[1];", 2) - w2)) < 1e-9

    def test_operand_count_errors(self):
        import pytest
        from gpu_quantum_simulator_tpu.qasm.parser import QasmError
        for bad in ["ctrl(2) @ gphase(0.7) q[0];",
                    "ctrl @ gphase(0.7) q[0], q[1];"]:
            with pytest.raises(QasmError):
                self._u(bad, 2)


class TestQasm3Classical:
    """OpenQASM 3 compile-time classical subset: input/const declarations,
    for loops (inclusive ranges, steps, value sets, nesting), and
    arithmetic register indices — all expanded before the statement walk."""

    def test_for_loop_ghz(self):
        import numpy as np
        import gpu_quantum_simulator_tpu as Q
        src = ("OPENQASM 3;\nqubit[5] q;\nh q[0];\n"
               "for uint i in [0:3] { cx q[i], q[i+1]; }\n")
        c = Q.parse_qasm(src)
        assert [(g.name, g.qubits) for g in c.gates] == [
            ("h", (0,)), ("cx", (0, 1)), ("cx", (1, 2)),
            ("cx", (2, 3)), ("cx", (3, 4))]
        p = np.abs(np.asarray(Q.simulate(c, strategy="megakernel"))) ** 2
        assert abs(p[0] - 0.5) < 1e-6 and abs(p[31] - 0.5) < 1e-6

    def test_inputs_consts_steps_sets_nesting(self):
        import gpu_quantum_simulator_tpu as Q
        src = ("OPENQASM 3;\ninput float theta;\nconst uint n = 4;\n"
               "qubit[4] q;\n"
               "for uint i in [0:n-1] { rz(theta*i) q[i]; }\n"
               "for uint i in [0:2:n-2] { for uint j in {1, 3} "
               "{ cx q[i], q[j]; } }\n")
        c = Q.parse_qasm(src, inputs={"theta": 0.25})
        names = [(g.name, g.qubits, g.params) for g in c.gates]
        assert names[1] == ("rz", (1,), (0.25,))
        assert names[3][2] == (0.75,)
        assert ("cx", (0, 1), ()) in names and ("cx", (2, 3), ()) in names

    def test_descending_range(self):
        import gpu_quantum_simulator_tpu as Q
        c = Q.parse_qasm("OPENQASM 3;\nqubit[3] q;\n"
                         "for int i in [2:-1:0] { h q[i]; }\n")
        assert [g.qubits[0] for g in c.gates] == [2, 1, 0]

    def test_errors(self):
        import pytest
        from gpu_quantum_simulator_tpu.qasm.parser import QasmError
        import gpu_quantum_simulator_tpu as Q
        with pytest.raises(QasmError, match="no value for input"):
            Q.parse_qasm("OPENQASM 3;\ninput float t;\nqubit[1] q;\n"
                         "rz(t) q[0];\n")
        with pytest.raises(QasmError, match="zero loop step"):
            Q.parse_qasm("OPENQASM 3;\nqubit[2] q;\n"
                         "for int i in [0:0:1] { h q[0]; }\n")
        with pytest.raises(QasmError, match="unbalanced braces"):
            Q.parse_qasm("OPENQASM 3;\nqubit[2] q;\n"
                         "for int i in [0:1] { h q[0];\n")


def test_dynamic_parser_classical_subset():
    """input/const/for expand in the dynamic subset too — loops may carry
    measurements and conditioned gates."""
    from gpu_quantum_simulator_tpu.dynamic import Measure
    from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_dynamic

    dc = parse_qasm_dynamic(
        "OPENQASM 3;\ninput float theta;\nqubit[3] q; bit[3] c;\n"
        "for uint i in [0:2] { rz(theta*(i+1)) q[i]; }\n"
        "for uint i in [0:2] { c[i] = measure q[i]; }\n",
        inputs={"theta": 0.5})
    ms = [(m.qubit, m.clbit) for m in dc.items if isinstance(m, Measure)]
    assert ms == [(0, 0), (1, 1), (2, 2)]
    assert dc.items[1].params == (1.0,)


def test_precounted_header_format():
    """The CUDA variants' preprocessed "<num_q> <num_g>" format
    (quantum_simulator_naive.cu:239-240) is accepted drop-in: header
    integers replace the QASM declarations, exactly num_g gates are read,
    trailing content is ignored (matching the reference reader's
    i<num_g loop)."""
    import numpy as np

    import gpu_quantum_simulator_tpu as Q

    src = "3 4\nh q[0];\ncx q[0], q[1];\nrz(0.5) q[2];\nsx q[1];\n"
    c = Q.parse_qasm(src)
    assert c.num_qubits == 3
    assert [(g.name, g.qubits) for g in c.gates] == [
        ("h", (0,)), ("cx", (0, 1)), ("rz", (2,)), ("sx", (1,))]
    assert np.isclose(c.gates[2].params[0], 0.5)

    # equivalent QASM3 spelling produces the identical circuit
    c2 = Q.parse_qasm(
        "OPENQASM 3.0;\nqubit[3] q;\n"
        "h q[0];\ncx q[0], q[1];\nrz(0.5) q[2];\nsx q[1];\n")
    for a, b in zip(c.gates, c2.gates):
        assert (a.name, a.qubits, a.params) == (b.name, b.qubits, b.params)

    # num_g caps consumption: the 5th statement is ignored
    c3 = Q.parse_qasm(src + "x q[0];\n")
    assert len(c3.gates) == 4
    # EOF before num_g gates ends the circuit early (feof semantics)
    c4 = Q.parse_qasm("2 99\nh q[0];\ncx q[0], q[1];\n")
    assert len(c4.gates) == 2
    # register name is never checked (the reference scans straight to '[')
    c5 = Q.parse_qasm("2 1\nh anyreg[1];\n")
    assert c5.gates[0].qubits == (1,)
