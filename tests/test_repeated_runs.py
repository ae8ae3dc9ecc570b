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
