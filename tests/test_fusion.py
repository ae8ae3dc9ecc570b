"""Fusion-pass equivalence: fused op-list ≡ unfused gate stream (dense check)."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.ir.oplist import circuit_to_ops, oplist_to_circuit_matrix
from gpu_quantum_simulator_tpu.passes.fuse2x2 import fuse_2x2
from gpu_quantum_simulator_tpu.passes.fuse4x4 import fuse_4x4
from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k
from gpu_quantum_simulator_tpu.passes.permute import (
    apply_permutation_to_ops,
    plan_permutation,
    unpermute_state,
)


def _dense(ops, n):
    return oplist_to_circuit_matrix(ops, n)


@pytest.mark.parametrize("seed", range(4))
def test_fuse2x2_equivalence(seed):
    c = models.random_circuit(4, 60, seed=seed)
    want = _dense(circuit_to_ops(c), 4)
    got = _dense(fuse_2x2(c), 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
def test_fuse4x4_equivalence(seed):
    c = models.random_circuit(4, 60, seed=seed)
    want = _dense(circuit_to_ops(c), 4)
    got = _dense(fuse_4x4(c), 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("k", [2, 3, 4])
def test_fuse_k_equivalence(seed, k):
    c = models.random_circuit(4, 60, seed=seed)
    want = _dense(circuit_to_ops(c), 4)
    ops = fuse_k(c, max_qubits=k)
    for op in ops:
        assert op.width <= k
    got = _dense(ops, 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_fuse4x4_compresses_grover():
    c = models.load_reference_circuit("grover_3_18")
    ops = fuse_4x4(c)
    # 2445 gates with 1024 cx must collapse substantially
    assert len(ops) < 1100


def test_fuse_k7_compresses_grover_hard():
    c = models.load_reference_circuit("grover_3_18")
    ops = fuse_k(fuse_4x4(c), max_qubits=6)
    # the whole 6-qubit circuit can fuse to a single 64x64 block
    assert len(ops) == 1
    assert ops[0].width == 6


def test_fuse2x2_identity_elision():
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(2).h(0).h(0).cx(0, 1)  # H·H == I, must not be flushed
    ops = fuse_2x2(c)
    assert [op.kind for op in ops] == ["cx"]


def test_permutation_roundtrip():
    c = models.random_circuit(5, 80, seed=9)
    perm = plan_permutation(c)
    relabeled = c.relabeled(perm)
    ops = circuit_to_ops(relabeled)
    # simulate the relabeled ops densely, then unpermute
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    v_perm = simulate_reference(relabeled)
    v = unpermute_state(v_perm, perm)
    want = simulate_reference(c)
    np.testing.assert_allclose(v, want, atol=1e-10)


def test_apply_permutation_to_ops_equivalence():
    c = models.random_circuit(4, 50, seed=11)
    perm = plan_permutation(c)
    ops_a = apply_permutation_to_ops(fuse_4x4(c), perm)
    ops_b = fuse_4x4(c.relabeled(perm))
    got = _dense(ops_a, 4)
    want = _dense(ops_b, 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_plan_permutation_orders_by_usage():
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(3)
    for _ in range(5):
        c.h(2)
    c.h(1)
    perm = plan_permutation(c)
    assert perm[2] == 0  # hottest qubit gets label 0
