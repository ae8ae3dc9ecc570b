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
