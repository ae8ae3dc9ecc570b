"""Batched trajectory ensembles (dynamic.run_dynamic_batched).

The ensemble rides the amplitude-index axis: 2^s trajectories = one
(n+s)-qubit state.  Tests pin the same physics as tests/test_dynamic.py
(collapse, correlations, reset, teleportation) plus agreement of the
batched outcome distribution with the per-shot path.
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.dynamic import (
    DynamicCircuit,
    run_dynamic,
    run_dynamic_batched,
)
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


def test_bell_correlation_batched():
    dc = DynamicCircuit(2, num_clbits=2)
    dc.h(0).cx(0, 1)
    dc.measure(0, 0)
    dc.measure(1, 1)
    res = run_dynamic_batched(dc, shots=256, seed=3)
    assert len(res) == 256
    outcomes = [r.clbits for r in res]
    assert all(a == b for a, b in outcomes)
    ones = sum(a for a, _ in outcomes)
    assert 80 < ones < 176                       # ~Binomial(256, 1/2)


def test_collapse_batched_states():
    dc = DynamicCircuit(1, num_clbits=1)
    dc.h(0)
    dc.measure(0, 0)
    for r in run_dynamic_batched(dc, shots=16, seed=1, return_states=True):
        want = np.zeros(2, dtype=complex)
        want[r.clbits[0]] = 1.0
        assert np.max(np.abs(np.abs(r.state) - np.abs(want))) < 1e-5


def test_reset_batched():
    dc = DynamicCircuit(2)
    dc.h(0).cx(0, 1)        # entangled, then wipe qubit 0
    dc.reset(0)
    for t in run_dynamic_batched(dc, shots=32, seed=0, return_states=True):
        p = np.abs(t.state) ** 2
        assert p[0] + p[2] == pytest.approx(1.0, abs=1e-5)  # qubit0 == |0>
        assert np.isclose(p.sum(), 1.0, atol=1e-5)


def test_teleportation_batched():
    theta, phi = 1.234, 0.567
    dc = DynamicCircuit(3, num_clbits=2)
    dc.rz(theta, 0)
    dc.sx(0)
    dc.rz(phi, 0)
    dc.h(1).cx(1, 2)
    dc.cx(0, 1).h(0)
    dc.measure(0, 0)
    dc.measure(1, 1)
    dc.c_if(1, "x", 2)
    dc.c_if(0, "z", 2)

    msg = Circuit(1)
    msg.rz(theta, 0)
    msg.sx(0)
    msg.rz(phi, 0)
    want = simulate_reference(msg)

    seen = set()
    for r in run_dynamic_batched(dc, shots=32, seed=7, return_states=True):
        m0, m1 = r.clbits
        seen.add((m0, m1))
        base = m0 | (m1 << 1)
        got = np.array([r.state[base], r.state[base | 4]])
        k = np.argmax(np.abs(want))
        got = got * (want[k] / got[k]) * (abs(got[k]) / abs(want[k]))
        assert np.max(np.abs(got - want)) < 1e-5
    assert len(seen) >= 3        # multiple correction branches exercised


def test_conditional_value_zero_batched():
    dc = DynamicCircuit(1, num_clbits=1)
    dc.measure(0, 0)
    dc.c_if(0, "x", 0, value=0)
    for t in run_dynamic_batched(dc, shots=4, seed=0, return_states=True):
        assert t.clbits == (0,)
        assert abs(abs(t.state[1]) - 1.0) < 1e-5


def test_batched_distribution_matches_per_shot():
    # biased coin: rz/sx preparation, P(1) fixed; the batched and per-shot
    # paths must agree on the distribution (different RNG streams)
    dc = DynamicCircuit(3, num_clbits=1)
    dc.rz(0.9, 0)
    dc.sx(0)
    dc.cx(0, 2)
    dc.measure(2, 0)
    per_shot = run_dynamic(dc, shots=64, seed=11)
    batched = run_dynamic_batched(dc, shots=512, seed=12)
    p_ref = np.mean([r.clbits[0] for r in per_shot])
    p_bat = np.mean([r.clbits[0] for r in batched])
    assert abs(p_bat - p_ref) < 0.17             # ~4 sigma of the 64-shot ref


def test_non_power_of_two_shots():
    dc = DynamicCircuit(1, num_clbits=1)
    dc.h(0)
    dc.measure(0, 0)
    res = run_dynamic_batched(dc, shots=37, seed=5)
    assert len(res) == 37


def test_width_cap_chunks_shot_budget():
    dc = DynamicCircuit(3, num_clbits=1)
    dc.h(0).cx(0, 1)
    dc.measure(0, 0)
    # max_width 6 -> chunks of 2^3 = 8 shots; 20 shots = 3 chunks
    res = run_dynamic_batched(dc, shots=20, seed=2, max_width=6)
    assert len(res) == 20
    ones = sum(r.clbits[0] for r in res)
    assert 0 < ones < 20

    with pytest.raises(ValueError):
        run_dynamic_batched(dc, shots=4, max_width=3)


def test_batched_strategies_agree():
    dc = DynamicCircuit(8, num_clbits=1)
    rng = np.random.default_rng(0)
    for _ in range(30):
        q = int(rng.integers(8))
        dc.rz(float(rng.uniform(0, 6.28)), q)
        dc.sx(q)
    dc.measure(3, 0)
    dc.h(0)
    outs = {}
    for strat in ("mxu", "prefetch"):
        res = run_dynamic_batched(
            dc, SimulatorConfig(strategy=strat), shots=8, seed=5,
            return_states=True)
        outs[strat] = res
    for a, b in zip(outs["mxu"], outs["prefetch"]):
        assert a.clbits == b.clbits
        assert np.max(np.abs(a.state - b.state)) < 2e-5
