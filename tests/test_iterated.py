import numpy as np
from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
from gpu_quantum_simulator_tpu.ops.apply import join_state

def test_iterated_grover_matches_unrolled():
    prefix, body, iters = models.grover_parts(5, marked=19)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device_iterated(body, iters, prefix=prefix)
    got = join_state(np.asarray(re), np.asarray(im))
    want = simulate_reference(models.grover(5, marked=19))
    np.testing.assert_allclose(got, want, atol=5e-5)
    p = np.abs(got) ** 2
    assert int(np.argmax(p)) == 19

def test_iterated_vmem_strategy():
    prefix, body, iters = models.grover_parts(4, marked=7)
    sim = Simulator(SimulatorConfig(strategy="vmem"))
    re, im, _ = sim.run_device_iterated(body, iters, prefix=prefix)
    got = join_state(np.asarray(re), np.asarray(im))
    want = simulate_reference(models.grover(4, marked=7))
    np.testing.assert_allclose(got, want, atol=5e-5)

def test_iterated_zero_reps_and_suffix():
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    c1 = models.ghz(6)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device_iterated(Circuit(6).x(0), 0, prefix=c1, suffix=Circuit(6).x(5))
    got = join_state(np.asarray(re), np.asarray(im))
    ref = models.ghz(6); ref.x(5)
    want = simulate_reference(ref)
    np.testing.assert_allclose(got, want, atol=2e-5)
