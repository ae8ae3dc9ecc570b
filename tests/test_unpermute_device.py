"""Device-side basis restore at large n (ops/apply.unpermute_device).

The n > 14 path decomposes a qubit relabeling into bit transpositions with
three low-rank executions (row<->row reshape, lane<->lane 128x128
permutation matmul, mixed lane<->row shuffle+256x256 matmul) — the code
that runs exactly at the scales (n >= 26) no end-to-end test can reach.
These tests pin every branch against the host-side unpermute_state twin at
n = 15..17 (hermetic CPU).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_quantum_simulator_tpu.ops import apply as A
from gpu_quantum_simulator_tpu.passes.permute import unpermute_state


def _random_state(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex64)


def _device_unpermute(state, perm):
    re = jnp.asarray(state.real, dtype=jnp.float32)
    im = jnp.asarray(state.imag, dtype=jnp.float32)
    re, im = A.unpermute_device(re, im, tuple(int(p) for p in perm))
    return np.asarray(re) + 1j * np.asarray(im)


def _check(n, perm, seed=0):
    state = _random_state(n, seed)
    got = _device_unpermute(state, np.asarray(perm))
    want = unpermute_state(state, np.asarray(perm))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------- swap branches
def test_swap_row_row():
    # qubits 8 <-> 10: both above LANE_QUBITS -> pure row reshape branch
    n = 15
    perm = np.arange(n)
    perm[[8, 10]] = perm[[10, 8]]
    _check(n, perm, seed=1)


def test_swap_lane_lane():
    # qubits 2 <-> 5: both below LANE_QUBITS -> 128x128 permutation matmul
    n = 15
    perm = np.arange(n)
    perm[[2, 5]] = perm[[5, 2]]
    _check(n, perm, seed=2)


def test_swap_mixed_lane_row():
    # qubit 3 <-> 12: lane <-> row -> shuffle + 256x256 matmul branch
    n = 15
    perm = np.arange(n)
    perm[[3, 12]] = perm[[12, 3]]
    _check(n, perm, seed=3)


def test_swap_mixed_lane_row_lowest_rowbit():
    # row bit 0 (qubit 7) is the boundary case of the mixed branch
    n = 15
    perm = np.arange(n)
    perm[[0, 7]] = perm[[7, 0]]
    _check(n, perm, seed=4)


# ----------------------------------------------------- full permutations
@pytest.mark.parametrize("n,seed", [(15, 10), (16, 11), (17, 12)])
def test_random_permutation_large_n(n, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    _check(n, perm, seed=seed)


def test_reverse_permutation():
    # worst case: every qubit moves, maximal chain of transpositions
    n = 16
    perm = np.arange(n)[::-1].copy()
    _check(n, perm, seed=20)


def test_dense_path_agrees_with_decomposed():
    """n=14 dense transpose and the n>14 decomposition must agree: run the
    same permutation through both by lying about the threshold via a 15-
    qubit state whose top qubit is fixed."""
    n = 15
    rng = np.random.default_rng(30)
    perm = np.concatenate([rng.permutation(14), [14]])
    state = _random_state(n, 31)
    got = _device_unpermute(state, perm)
    # host twin on the low-14 block applied to each half
    want = unpermute_state(state, perm)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_identity_is_noop():
    n = 15
    state = _random_state(n, 40)
    got = _device_unpermute(state, np.arange(n))
    np.testing.assert_allclose(got, state, atol=0)


# -------------------------------------------------- end-to-end at n = 15
def test_mxu_end_to_end_n15():
    """Full pipeline parity at n=15: permute pass + wide engine + device
    basis restore (the exact composition the n>=26 runs rely on)."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    c = models.grover_like(15, num_gates=300, seed=50)
    res = Simulator(SimulatorConfig(strategy="mxu")).run_detailed(c)
    want = simulate_reference(c)
    assert np.max(np.abs(res.state - want)) < 2e-5
