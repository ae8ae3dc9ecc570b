"""Pallas kernel tests (interpret mode on CPU — hermetic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ir import gates as G
from gpu_quantum_simulator_tpu.ops import pallas_kernels as PK
from gpu_quantum_simulator_tpu.ref import cpu as REF

TOL = 2e-5


def test_apply_block128_identity():
    R = 16
    rng = np.random.default_rng(0)
    sre = jnp.asarray(rng.normal(size=(R, 128)), dtype=jnp.float32)
    sim = jnp.asarray(rng.normal(size=(R, 128)), dtype=jnp.float32)
    eye = np.eye(128, dtype=np.float32)
    ore, oim = PK.apply_block128(sre, sim, eye, np.zeros_like(eye), interpret=True)
    np.testing.assert_allclose(ore, sre, atol=1e-6)
    np.testing.assert_allclose(oim, sim, atol=1e-6)


def test_apply_block128_random_unitary_vs_numpy():
    rng = np.random.default_rng(1)
    # random complex matrix (need not be unitary for the algebra check)
    m = rng.normal(size=(128, 128)) + 1j * rng.normal(size=(128, 128))
    s = rng.normal(size=(8, 128)) + 1j * rng.normal(size=(8, 128))
    ore, oim = PK.apply_block128(
        jnp.asarray(s.real, jnp.float32),
        jnp.asarray(s.imag, jnp.float32),
        m.real.astype(np.float32),
        m.imag.astype(np.float32),
        interpret=True,
    )
    want = s @ m.T
    np.testing.assert_allclose(np.asarray(ore), want.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(oim), want.imag, atol=1e-3)


def test_butterfly_high_vs_einsum():
    n = 10  # R = 8 rows
    rng = np.random.default_rng(2)
    v = rng.normal(size=(1 << n,)) + 1j * rng.normal(size=(1 << n,))
    u = G.matrix_1q("h")
    for high_bit in [0, 1, 2]:
        qubit = PK.LANE_QUBITS + high_bit
        sre = jnp.asarray(v.real.reshape(-1, 128), jnp.float32)
        sim = jnp.asarray(v.imag.reshape(-1, 128), jnp.float32)
        ore, oim = PK.apply_butterfly_high(sre, sim, u, high_bit, interpret=True)
        got = (np.asarray(ore) + 1j * np.asarray(oim)).reshape(-1)
        from gpu_quantum_simulator_tpu.ir.circuit import Gate
        want = REF.apply_gate_numpy(v, n, Gate("h", (qubit,)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_swap_low_high_roundtrip():
    n = 9
    rng = np.random.default_rng(3)
    v = rng.normal(size=(1 << n,)).astype(np.float32)
    re = jnp.asarray(v)
    im = jnp.zeros_like(re)
    re2, _ = PK.swap_low_high(re, im, 2, 8, n)
    # swapping bits 2 and 8 relabels indices: i' has bit2<->bit8 exchanged
    idx = np.arange(1 << n)
    b2 = (idx >> 2) & 1
    b8 = (idx >> 8) & 1
    swapped = (idx & ~((1 << 2) | (1 << 8))) | (b8 << 2) | (b2 << 8)
    np.testing.assert_allclose(np.asarray(re2).reshape(-1), v[swapped], atol=0)
    re3, _ = PK.swap_low_high(re2, im, 2, 8, n)
    np.testing.assert_allclose(np.asarray(re3).reshape(-1), v, atol=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_engine_parity_random(seed):
    c = models.random_circuit(9, 120, seed=seed)
    got = Simulator(SimulatorConfig(strategy="pallas")).run(c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_engine_small_n_fallback():
    c = models.bell()
    got = Simulator(SimulatorConfig(strategy="pallas")).run(c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_engine_grover_profile():
    c = models.grover_like(9, num_gates=400, seed=5)
    got = Simulator(SimulatorConfig(strategy="pallas")).run(c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)
