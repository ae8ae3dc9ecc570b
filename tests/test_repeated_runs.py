"""Repeated-run safety: donated buffers must never leak to callers."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


@pytest.mark.parametrize("strategy", ["mxu", "vmem", "megakernel"])
def test_three_consecutive_runs_identical(strategy):
    c = models.random_circuit(9, 120, seed=17)
    sim = Simulator(SimulatorConfig(strategy=strategy))
    want = simulate_reference(c)
    results = [sim.run(c) for _ in range(3)]
    for r in results:
        np.testing.assert_allclose(r, want, atol=2e-5)
    np.testing.assert_array_equal(results[0], results[1])
    np.testing.assert_array_equal(results[1], results[2])


def test_interleaved_circuits_share_simulator():
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    c1 = models.random_circuit(8, 80, seed=1)
    c2 = models.random_circuit(8, 80, seed=2)
    for _ in range(2):
        np.testing.assert_allclose(sim.run(c1), simulate_reference(c1), atol=2e-5)
        np.testing.assert_allclose(sim.run(c2), simulate_reference(c2), atol=2e-5)


def test_run_many_pipelined_batch():
    """run_many: state mode matches per-circuit runs; terms mode returns
    the per-circuit <H> scalars; width mixing rejected in terms mode."""
    import pytest

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    sim = Simulator(SimulatorConfig(strategy="prefetch"))
    circuits = [models.random_circuit(9, 60, seed=s) for s in range(5)]

    states = sim.run_many(circuits, throttle=2)
    for c, v in zip(circuits, states):
        want = sim.run(c)
        assert np.max(np.abs(v - want)) < 1e-6

    terms = [(0.7, "Z0 Z4"), (-0.2, "X2"), (0.5, "I" * 9)]
    got = sim.run_many(circuits, terms=terms, throttle=2)
    for c, e in zip(circuits, got):
        assert abs(e - expectation_pauli_sum(c, terms)) < 1e-5

    assert sim.run_many([]) == []
    with pytest.raises(ValueError):
        sim.run_many([models.ghz(3), models.ghz(4)], terms=[(1.0, "Z0")])
