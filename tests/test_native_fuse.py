"""Native C++ fusion pipeline vs the Python passes (semantic ground truth)."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.ir.oplist import circuit_to_ops, oplist_to_circuit_matrix
from gpu_quantum_simulator_tpu.passes import native_fuse as NF

pytestmark = pytest.mark.skipif(not NF.available(), reason="native toolchain unavailable")


def _dense(ops, n):
    return oplist_to_circuit_matrix(ops, n)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("max_high", [None, 2, 1])
def test_native_fuse_equivalence(seed, max_high):
    n = 5
    c = models.random_circuit(n, 80, seed=seed)
    want = _dense(circuit_to_ops(c), n)
    ops = NF.fuse_native(c, max_qubits=4, max_high=max_high, high_threshold=3)
    for op in ops:
        assert op.width <= 4
        if max_high is not None:
            # a bare 2q gate whose qubits are both high cannot satisfy
            # max_high=1 under any fusion; it passes through as-is (the
            # Python pass does the same), so the cap holds at max(cap, 2)
            assert sum(1 for q in op.qubits if q >= 3) <= max(max_high, 2)
    got = _dense(ops, n)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_native_fuse_matches_python_on_grover():
    from gpu_quantum_simulator_tpu.passes.fuse4x4 import fuse_4x4
    from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k

    c = models.load_reference_circuit("grover_3_18")
    py_ops = fuse_k(fuse_4x4(c), max_qubits=6)
    nat_ops = NF.fuse_native(c, max_qubits=6)
    # same semantics: dense unitaries must agree
    np.testing.assert_allclose(
        _dense(nat_ops, 6), _dense(py_ops, 6), atol=1e-9
    )


@pytest.mark.parametrize("window", [1, 2, 4, 16])
@pytest.mark.parametrize("seed", [0, 3])
def test_windowed_fusion_equivalence(window, seed):
    # the commutation rule (absorb into older blocks past disjoint newer
    # ones) must preserve the circuit unitary for ANY window
    n = 6
    c = models.random_circuit(n, 120, seed=seed)
    want = _dense(circuit_to_ops(c), n)
    ops = NF.fuse_native(c, max_qubits=4, max_high=2, high_threshold=3, window=window)
    got = _dense(ops, n)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_window_reduces_op_count():
    c = models.grover_like(18, 2445, seed=318)
    n1 = len(NF.fuse_native(c, 7, 2, window=1))
    n8 = len(NF.fuse_native(c, 7, 2, window=8))
    assert n8 < n1


def test_native_fuse_compresses():
    c = models.grover_like(10, 600, seed=3)
    ops = NF.fuse_native(c, max_qubits=7, max_high=2)
    assert len(ops) < 200


def test_mxu_strategy_uses_native_and_is_correct():
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    c = models.random_circuit(9, 150, seed=7)
    got = Simulator(SimulatorConfig(strategy="mxu")).run(c)
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=2e-5)
