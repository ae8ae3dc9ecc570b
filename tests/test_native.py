"""Native C++ reference vs Python ground truth."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.qasm.parser import parse_qasm_file
from gpu_quantum_simulator_tpu.ref import cpu as REF
from gpu_quantum_simulator_tpu.ref import native as NAT

pytestmark = pytest.mark.skipif(
    not NAT.available(), reason="native toolchain unavailable"
)


def test_native_parser_matches_python_on_grover():
    path = "/root/reference/grover_3_18.qasm"
    a = parse_qasm_file(path)
    b = NAT.parse_qasm_native(path, is_path=True)
    assert b.num_qubits == a.num_qubits
    assert len(b) == len(a)
    for ga, gb in zip(a.gates, b.gates):
        assert ga.name == gb.name and ga.qubits == gb.qubits
        np.testing.assert_allclose(ga.params, gb.params, atol=1e-12)


def test_native_parser_expressions():
    c = NAT.parse_qasm_native("qubit[1] q; rz(-3*pi/4) q[0]; rz(2.5e-1) q[0];")
    assert c.gates[0].params[0] == pytest.approx(-3 * np.pi / 4)
    assert c.gates[1].params[0] == pytest.approx(0.25)


def test_native_parser_errors():
    with pytest.raises(ValueError, match="unknown gate"):
        NAT.parse_qasm_native("qubit[2] q; ccx q[0], q[1];")
    with pytest.raises(ValueError, match="out of range"):
        NAT.parse_qasm_native("qubit[2] q; h q[7];")
    with pytest.raises(ValueError, match="cannot open"):
        NAT.parse_qasm_native("/no/such/file.qasm", is_path=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_simulator_parity_random(seed):
    c = models.random_circuit(7, 200, seed=seed)
    got = NAT.simulate_native(c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_native_simulator_grover_file_direct():
    got = NAT.simulate_native("/root/reference/grover_3_18.qasm")
    want = REF.simulate_reference(parse_qasm_file("/root/reference/grover_3_18.qasm"))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_native_sampling():
    v = REF.simulate_reference(models.bell())
    s = NAT.sample_native(v, 4000, seed=1)
    assert set(np.unique(s)) <= {0, 3}
    assert 0.45 < np.mean(s == 0) < 0.55
