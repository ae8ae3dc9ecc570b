import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models, simulate
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.models.circuits import _ccx, _controlled_z_all
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


@pytest.mark.parametrize("inp", range(8))
def test_ccx_truth_table(inp):
    c = Circuit(3)
    for b in range(3):
        if (inp >> b) & 1:
            c.x(b)
    _ccx(c, 0, 1, 2)
    v = simulate_reference(c)
    expect = inp ^ (4 if (inp & 3) == 3 else 0)
    assert int(np.argmax(np.abs(v))) == expect
    assert abs(abs(v[expect]) - 1) < 1e-9  # no stray relative phase on basis states


def test_controlled_z_all_phases():
    # C^3 Z over 4 data qubits (2 ancillas): -1 phase iff data == 1111,
    # ancillas returned to |0>
    for inp in [0b0000, 0b0111, 0b1111]:
        c = Circuit(6)
        for b in range(4):
            if (inp >> b) & 1:
                c.x(b)
        _controlled_z_all(c, [0, 1, 2, 3], [4, 5])
        v = simulate_reference(c)
        idx = int(np.argmax(np.abs(v)))
        assert idx == inp  # ancillas clean
        want = -1.0 if inp == 0b1111 else 1.0
        assert v[idx] == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("marked", [0, 13, 31])
def test_grover_finds_marked(marked):
    c = models.grover(5, marked=marked)
    v = simulate_reference(c)
    p = np.abs(v) ** 2
    assert int(np.argmax(p)) == marked
    assert p[marked] > 0.99


def test_grover_on_engine():
    c = models.grover(4, marked=9)
    got = simulate(c, strategy="mxu")
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_grover_like_profile():
    c = models.grover_like(8, num_gates=500, seed=1)
    counts = c.gate_counts()
    assert set(counts) <= {"cx", "rz", "sx", "x"}
    assert len(c) == 500


def test_ghz_and_qft_sizes():
    assert len(models.ghz(7)) == 7
    assert models.qft(5).num_qubits == 5
