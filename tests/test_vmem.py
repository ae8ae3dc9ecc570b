"""VMEM-resident Pallas megakernel (interpret mode on CPU)."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.engine.vmem import build_vmem_program
from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts
from gpu_quantum_simulator_tpu.passes.fuse4x4 import fuse_4x4
from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

TOL = 2e-5


def _run_vmem(circuit, chunk_ops=96):
    n = circuit.num_qubits
    ops = fuse_k(fuse_4x4(circuit), max_qubits=min(7, n), max_high=2)
    fn = build_vmem_program(ops, n, interpret=True, chunk_ops=chunk_ops)
    re, im = initial_state_parts(n)
    r, i = fn(re, im)
    return np.asarray(r) + 1j * np.asarray(i)


@pytest.mark.parametrize("seed", [0, 1])
def test_vmem_parity_random(seed):
    c = models.random_circuit(9, 150, seed=seed)
    got = _run_vmem(c)
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_vmem_multi_chunk_boundaries():
    c = models.random_circuit(10, 300, seed=5)
    got = _run_vmem(c, chunk_ops=3)  # force many chunk boundaries
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_vmem_kh2_blocks():
    # blocks that keep two high (row) qubits — exercises the rank-6 shuffle
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(10)
    for i in range(12):
        c.cx(9, 8).rz(0.2 * i + 0.1, 9).h(8).cx(8, 7).t(7)
    got = _run_vmem(c)
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_vmem_rejects_deep_high():
    from gpu_quantum_simulator_tpu.ir.oplist import Op
    import numpy as np

    u = np.eye(8, dtype=np.complex128)
    with pytest.raises(ValueError, match="2 high"):
        build_vmem_program([Op("u", (7, 8, 9), u)], 10, interpret=True)


def test_roofline_model():
    from gpu_quantum_simulator_tpu.utils.roofline import wide_program_cost

    c = models.grover_like(12, 500, seed=2)
    ops = fuse_k(fuse_4x4(c), max_qubits=7, max_high=2)
    cost = wide_program_cost(ops, 12)
    assert cost.flops > 0 and cost.hbm_bytes > 0
    assert cost.seconds() > 0
    assert cost.arithmetic_intensity > 3.5  # beats the reference's 2x2 kernel
