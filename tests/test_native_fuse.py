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


@pytest.mark.parametrize("window", [1, 8])
@pytest.mark.parametrize("seed", [0, 2])
def test_cost_model_fusion_equivalence(window, seed):
    # split low/high caps + kh-cost candidate selection must preserve the
    # circuit unitary and respect BOTH caps independently
    from gpu_quantum_simulator_tpu.utils.roofline import kh_block_costs

    n = 6
    thr = 3
    c = models.random_circuit(n, 150, seed=seed)
    want = _dense(circuit_to_ops(c), n)
    ops = NF.fuse_native(c, 3, 2, high_threshold=thr, window=window,
                         max_low=3, kh_costs=kh_block_costs(n))
    for op in ops:
        low = sum(1 for q in op.qubits if q < thr)
        high = len(op.qubits) - low
        assert low <= 3
        assert high <= 2
    got = _dense(ops, n)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_cost_model_reduces_predicted_cost():
    # the emitter's objective: windowed + cost model must beat plain
    # window-1 first-fit on predicted wide-engine cost, not just op count
    from gpu_quantum_simulator_tpu.passes.permute import plan_permutation
    from gpu_quantum_simulator_tpu.utils.roofline import kh_block_costs

    n = 18
    c = models.grover_like(n, 2445, seed=318)
    c = c.relabeled(plan_permutation(c))
    costs = kh_block_costs(n)

    def predicted(ops):
        return sum(
            costs[min(sum(1 for q in op.qubits if q >= 7), len(costs) - 1)]
            for op in ops
        )

    base = NF.fuse_native(c, 7, 2, window=1)
    cm = NF.fuse_native(c, 7, 2, window=8, max_low=7, kh_costs=costs)
    assert predicted(cm) < 0.85 * predicted(base)


def test_fuse_k_max_low_python_parity():
    # Python fallback mirrors the split-cap semantics (dense equivalence)
    from gpu_quantum_simulator_tpu.passes.fuse4x4 import fuse_4x4
    from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k

    n = 6
    thr = 3
    c = models.random_circuit(n, 120, seed=5)
    want = _dense(circuit_to_ops(c), n)
    ops = fuse_k(fuse_4x4(c), max_qubits=3, max_high=2,
                 high_threshold=thr, max_low=3)
    for op in ops:
        low = sum(1 for q in op.qubits if q < thr)
        assert low <= 3
        assert len(op.qubits) - low <= 2
    np.testing.assert_allclose(_dense(ops, n), want, atol=1e-9)
