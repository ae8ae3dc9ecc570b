import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
from gpu_quantum_simulator_tpu.utils.checkpoint import load_state, save_state


def test_save_load_roundtrip(tmp_path):
    v = simulate_reference(models.ghz(5))
    path = str(tmp_path / "snap.npz")
    save_state(path, v.real, v.imag, 5, meta={"note": "ghz"})
    re, im, meta = load_state(path)
    np.testing.assert_allclose(re + 1j * im, v, atol=0)
    assert meta["num_qubits"] == 5 and meta["note"] == "ghz"


def test_resume_equals_full_run(tmp_path):
    # run first half, checkpoint, resume second half == full run
    c = models.random_circuit(6, 100, seed=12)
    half = len(c) // 2
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c1 = Circuit(6, list(c.gates[:half]))
    c2 = Circuit(6, list(c.gates[half:]))

    sim = Simulator(SimulatorConfig(strategy="mxu"))
    v1 = sim.run(c1)
    path = str(tmp_path / "mid.npz")
    save_state(path, v1.real, v1.imag, 6)
    re, im, _ = load_state(path)
    v2 = sim.run(c2, initial=re + 1j * im)

    want = simulate_reference(c)
    np.testing.assert_allclose(v2, want, atol=5e-5)


def test_resume_with_permuting_engine(tmp_path):
    # permute=True relabels internally; initial state is in the ORIGINAL basis
    c = models.random_circuit(5, 60, seed=3)
    v_mid = simulate_reference(models.ghz(5))
    sim = Simulator(SimulatorConfig(strategy="megakernel", permute=True))
    got = sim.run(c, initial=v_mid)
    want = simulate_reference(c, initial=v_mid)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_initial_wrong_length():
    sim = Simulator(SimulatorConfig(strategy="megakernel"))
    with pytest.raises(ValueError, match="wrong length"):
        sim.run(models.bell(), initial=np.ones(8, dtype=complex))


def test_corrupt_checkpoint(tmp_path):
    v = simulate_reference(models.bell())
    path = str(tmp_path / "s.npz")
    save_state(path, v.real, v.imag, 2)
    re, im, meta = load_state(path)
    assert meta["num_qubits"] == 2
    with pytest.raises(ValueError):
        save_state(path, v.real, v.imag, 3)  # mismatched n
