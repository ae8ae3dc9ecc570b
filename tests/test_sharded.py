"""Multi-chip sharded engine on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ir.oplist import circuit_to_ops
from gpu_quantum_simulator_tpu.passes.shard import plan_sharded, SwapItem
from gpu_quantum_simulator_tpu.ref import cpu as REF

TOL = 2e-5


def _run(circuit, mesh_shape=None, **kw):
    cfg = SimulatorConfig(strategy="sharded", mesh_shape=mesh_shape, **kw)
    return Simulator(cfg).run(circuit)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh", [(1,), (2,), (4,), (8,)])
def test_ghz_parity_all_mesh_sizes(mesh):
    c = models.ghz(7)
    got = _run(c, mesh_shape=mesh)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_circuit_parity_8way(seed):
    c = models.random_circuit(8, 150, seed=seed)
    got = _run(c, mesh_shape=(8,))
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_grover_3_18_parity_4way():
    c = models.load_reference_circuit("grover_3_18")
    got = _run(c, mesh_shape=(4,), max_fused_qubits=4)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_gates_on_global_qubits_force_swaps():
    # every cx touches the top (global) qubits: planner must emit swaps
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    n, d = 6, 3
    c = Circuit(n)
    c.h(5).cx(5, 4).cx(4, 3)
    ops = circuit_to_ops(c)
    plan = plan_sharded(ops, n, d)
    assert plan.num_swaps > 0
    got = _run(c, mesh_shape=(8,), max_fused_qubits=3)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_plan_keeps_ops_local():
    c = models.random_circuit(8, 100, seed=3)
    ops = circuit_to_ops(c)
    plan = plan_sharded(ops, 8, 3)
    local_n = 5
    for item in plan.items:
        if isinstance(item, SwapItem):
            assert item.pos_a >= local_n and item.pos_b < local_n
        else:
            assert all(p < local_n for p in item.qubits)


def test_plan_rejects_too_wide_ops():
    c = models.ghz(4)
    from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k

    ops = fuse_k(c, max_qubits=4)  # one 4-wide block
    with pytest.raises(ValueError):
        plan_sharded(ops, 4, 1)  # only 3 local qubits


def test_permute_reduces_swaps():
    # hot qubits high: permutation should relabel them low and cut swaps
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    from gpu_quantum_simulator_tpu.passes.permute import plan_permutation

    n, d = 8, 3
    c = Circuit(n)
    for _ in range(20):
        c.cx(7, 6).h(7).h(6)
    base = plan_sharded(circuit_to_ops(c), n, d)
    perm = plan_permutation(c)
    relabeled = c.relabeled(perm)
    opt = plan_sharded(circuit_to_ops(relabeled), n, d)
    assert opt.num_swaps < base.num_swaps
    assert opt.num_swaps <= 2
