"""Dynamic circuits: mid-circuit measurement, reset, classical control.

Beyond-reference capability (the reference's only measurement support is a
disabled end-of-run sampling loop, quantum_simulator.c:68-73).  Trajectory
semantics are pinned by physics: Bell correlations, teleportation with
classically-controlled corrections, reset.
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.dynamic import DynamicCircuit, run_dynamic


def test_bell_measurement_correlation():
    dc = DynamicCircuit(2, num_clbits=2)
    dc.h(0).cx(0, 1)
    dc.measure(0, 0)
    dc.measure(1, 1)
    res = run_dynamic(dc, shots=40, seed=3)
    outcomes = [r.clbits for r in res]
    assert all(a == b for a, b in outcomes)          # perfectly correlated
    ones = sum(a for a, _ in outcomes)
    assert 5 < ones < 35                             # both branches occur


def test_measurement_collapses_state():
    dc = DynamicCircuit(1, num_clbits=1)
    dc.h(0)
    dc.measure(0, 0)
    for r in run_dynamic(dc, shots=10, seed=1, return_states=True):
        want = np.zeros(2, dtype=complex)
        want[r.clbits[0]] = 1.0
        assert np.max(np.abs(np.abs(r.state) - np.abs(want))) < 1e-5


def test_reset():
    dc = DynamicCircuit(1)
    dc.x(0)
    dc.reset(0)
    r = run_dynamic(dc, shots=3, seed=0, return_states=True)
    for t in r:
        assert abs(abs(t.state[0]) - 1.0) < 1e-5


def test_teleportation():
    """Teleport an arbitrary 1q state from qubit 0 to qubit 2 using two
    mid-circuit measurements and classically-controlled X/Z corrections."""
    theta, phi = 1.234, 0.567
    # message state: rz(phi) . sx . rz(theta) |0>
    dc = DynamicCircuit(3, num_clbits=2)
    dc.rz(theta, 0)
    dc.sx(0)
    dc.rz(phi, 0)
    dc.h(1).cx(1, 2)          # Bell pair on (1, 2)
    dc.cx(0, 1).h(0)
    dc.measure(0, 0)
    dc.measure(1, 1)
    dc.c_if(1, "x", 2)
    dc.c_if(0, "z", 2)

    # expected 1q message amplitudes
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    msg = Circuit(1)
    msg.rz(theta, 0)
    msg.sx(0)
    msg.rz(phi, 0)
    want = simulate_reference(msg)

    for r in run_dynamic(dc, shots=6, seed=7, return_states=True):
        m0, m1 = r.clbits
        # final state = |m0>_0 |m1>_1 (x) message_2: extract qubit-2 pair
        base = m0 | (m1 << 1)
        a0 = r.state[base]
        a1 = r.state[base | 4]
        got = np.array([a0, a1])
        # equal up to global phase
        k = np.argmax(np.abs(want))
        got = got * (want[k] / got[k]) * (abs(got[k]) / abs(want[k]))
        assert np.max(np.abs(got - want)) < 1e-5


def test_conditional_value_zero():
    dc = DynamicCircuit(1, num_clbits=1)
    dc.measure(0, 0)                   # |0> -> outcome always 0
    dc.c_if(0, "x", 0, value=0)        # fires on 0
    r = run_dynamic(dc, shots=2, seed=0, return_states=True)
    for t in r:
        assert t.clbits == (0,)
        assert abs(abs(t.state[1]) - 1.0) < 1e-5


def test_strategies_agree():
    dc = DynamicCircuit(9, num_clbits=1)
    rng = np.random.default_rng(0)
    for _ in range(40):
        q = int(rng.integers(9))
        dc.rz(float(rng.uniform(0, 6.28)), q)
        dc.sx(q)
    dc.measure(4, 0)
    dc.h(0)
    outs = {}
    for strat in ("mxu", "prefetch"):
        res = run_dynamic(
            dc, SimulatorConfig(strategy=strat), shots=1, seed=5,
            return_states=True)
        outs[strat] = res[0]
    assert outs["mxu"].clbits == outs["prefetch"].clbits
    assert np.max(np.abs(outs["mxu"].state - outs["prefetch"].state)) < 2e-5


def test_trajectory_average_matches_density_dephasing():
    """Measuring a qubit and discarding the outcome implements full
    dephasing: the trajectory-averaged populations must match the
    DensitySimulator with a p=1 dephasing channel (exact diagonal)."""
    from gpu_quantum_simulator_tpu.density import DensitySimulator, NoisyCircuit
    from gpu_quantum_simulator_tpu import models

    n = 3
    pre = models.random_circuit(n, 25, seed=4)
    post = models.random_circuit(n, 25, seed=5)

    nc = NoisyCircuit(n, items=list(pre.gates))
    nc.channel("dephasing", 1, p=1.0)
    for g in post.gates:
        nc.items.append(g)
    want = DensitySimulator().run(nc)
    want_p = want.probabilities()

    dc = DynamicCircuit(n, num_clbits=1)
    dc.items.extend(pre.gates)
    dc.measure(1, 0)
    dc.items.extend(post.gates)
    shots = 600
    acc = np.zeros(1 << n)
    for r in run_dynamic(dc, shots=shots, seed=12, return_states=True):
        acc += np.abs(r.state) ** 2
    got_p = acc / shots
    # Monte-Carlo over 600 deterministic-seed trajectories: ~4% tolerance
    assert np.max(np.abs(got_p - want_p)) < 0.06


def test_run_device_parts_composes():
    """Two chained device-parts segments == one run; original basis, no
    host round-trip in between (device arrays in, device arrays out)."""
    import jax

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu.engine.simulator import Simulator

    n = 9
    c1 = models.random_circuit(n, 60, seed=31)
    c2 = models.random_circuit(n, 60, seed=32)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im = initial_state_parts(n, dtype=jnp.float32)
    re, im, _ = sim.run_device_parts(c1, (re, im))
    assert isinstance(re, jax.Array) and isinstance(im, jax.Array)
    re, im, _ = sim.run_device_parts(c2, (re, im))
    got = join_state(np.asarray(re), np.asarray(im))
    merged = models.random_circuit(n, 60, seed=31)
    merged.gates.extend(c2.gates)
    want = simulate_reference(merged)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_dynamic_prefetch_strategy():
    """Trajectories run device-resident through the prefetch engine too."""
    from gpu_quantum_simulator_tpu.dynamic import DynamicCircuit, run_dynamic

    n = 9
    dc = DynamicCircuit(n, num_clbits=1)
    dc.h(0)
    for q in range(1, n):
        dc.cx(q - 1, q)
    dc.measure(0, 0)
    res = run_dynamic(dc, SimulatorConfig(strategy="prefetch"), shots=6, seed=3,
                      return_states=True)
    for r in res:
        # GHZ measurement collapses every qubit to the same value
        idx = int(np.argmax(np.abs(r.state) ** 2))
        assert idx in (0, (1 << n) - 1)
        assert (idx != 0) == bool(r.clbits[0])


def test_gate_helpers_cover_circuit_surface():
    # every Circuit construction helper works on DynamicCircuit too
    dc = DynamicCircuit(2, 1)
    dc.rx(0.3, 0).ry(0.2, 1).y(0).p(0.1, 1).u(0.1, 0.2, 0.3, 0)
    dc.sxdg(1).id(0)
    assert [g.name for g in dc.items] == [
        "rx", "ry", "y", "p", "u", "sxdg", "id"]
