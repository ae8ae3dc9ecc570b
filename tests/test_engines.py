"""Differential tests: every engine vs the double-precision CPU reference.

This is the test strategy the reference lacks entirely (SURVEY §4): its
correctness story was eyeballed amplitude dumps, since disabled
(quantum_simulator_naive.cu:207-216).
"""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.ref import cpu as REF

ENGINES = ["naive", "fused2x2", "fused3in1", "fused4x4", "megakernel", "scan", "mxu"]

# float32 engines vs float64 ground truth.  The WIDE-FUSED engines (mxu /
# prefetch) compose gate products in f64 on the host and apply only a few
# hundred f32 contractions: measured error at the FULL reference depth
# (2445 gates) is ~5e-8 on both CPU-XLA f32 and real TPU f32 with
# precision='highest' — an order of magnitude under the BASELINE.md 1e-6
# parity bar, gated at 1e-6 below.  The PER-GATE ablation replicas (naive /
# fused2x2 / 3in1 / 4x4 / megakernel / scan) round the state 2445 times in
# f32, exactly like the reference's GPU variants, and sit at 2-3e-6 on the
# deep workload: gated at the f32 random-walk bound 5e-6 (the 1e-6 bar is
# the flagship's; docs/PERFORMANCE.md "Accuracy").
TOL_F32 = 1e-6
TOL_F32_PER_GATE_DEEP = 5e-6
FUSED_ENGINES = ("mxu", "prefetch")


def _run(strategy, circuit, **kw):
    return Simulator(SimulatorConfig(strategy=strategy, **kw)).run(circuit)


@pytest.mark.parametrize("strategy", ENGINES)
def test_bell(strategy):
    got = _run(strategy, models.bell())
    want = REF.simulate_reference(models.bell())
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("strategy", ENGINES)
def test_ghz6(strategy):
    c = models.ghz(6)
    np.testing.assert_allclose(_run(strategy, c), REF.simulate_reference(c), atol=1e-6)


@pytest.mark.parametrize("strategy", ENGINES)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_full_gateset(strategy, seed):
    c = models.random_circuit(6, 120, seed=seed)
    got = _run(strategy, c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL_F32)


@pytest.mark.parametrize("strategy", ENGINES + ["prefetch"])
def test_grover_3_18_parity(strategy):
    c = models.load_reference_circuit("grover_3_18")
    got = _run(strategy, c)
    want = REF.simulate_reference(c)
    tol = TOL_F32 if strategy in FUSED_ENGINES else TOL_F32_PER_GATE_DEEP
    np.testing.assert_allclose(got, want, atol=tol)


@pytest.mark.parametrize("strategy", ["megakernel", "mxu"])
def test_complex128_parity_tight(strategy):
    # double-precision engine run must hit the 1e-6 bar on the deep workload
    c = models.load_reference_circuit("grover_3_18")
    got = _run(strategy, c, dtype="complex128")
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("strategy", ENGINES)
def test_permute_option_returns_original_basis(strategy):
    c = models.random_circuit(5, 60, seed=3)
    got = _run(strategy, c, permute=True)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL_F32)


@pytest.mark.parametrize("strategy", ENGINES)
def test_single_qubit_circuit(strategy):
    # regression: the native fuser rejects max_qubits < 2; the pipeline must
    # clamp rather than crash on 1-qubit circuits (ADVICE r1 #1)
    c = Circuit(1).h(0).t(0).h(0)
    got = _run(strategy, c)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_fused_qubits_one():
    c = models.random_circuit(4, 40, seed=5)
    got = _run("mxu", c, max_fused_qubits=1)
    np.testing.assert_allclose(got, REF.simulate_reference(c), atol=1e-6)


def test_iterated_complex128_actually_f64():
    # regression: run_device_iterated with complex128 must enable x64 like
    # _execute does (ADVICE r1 #3)
    sim = Simulator(SimulatorConfig(strategy="mxu", dtype="complex128"))
    body = models.random_circuit(4, 20, seed=9)
    re, im, _ = sim.run_device_iterated(body, repetitions=2)
    assert np.asarray(re).dtype == np.float64
    merged = Circuit(4)
    merged.gates.extend(body.gates)
    merged.gates.extend(body.gates)
    want = REF.simulate_reference(merged)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_cnot_nonadjacent_and_reversed():
    for (ctl, tgt) in [(0, 3), (3, 0), (1, 4), (4, 2)]:
        c = Circuit(5).x(ctl).cx(ctl, tgt)
        got = _run("naive", c)
        want = REF.simulate_reference(c)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_simulator_sample():
    sim = Simulator(SimulatorConfig(strategy="megakernel"))
    samples = sim.sample(models.bell(), 2000, seed=1)
    assert set(np.unique(samples)) <= {0, 3}


def test_run_detailed_reports_fusion():
    c = models.load_reference_circuit("grover_3_18")
    res = Simulator(SimulatorConfig(strategy="mxu")).run_detailed(c)
    assert res.num_gates == 2445
    assert res.num_fused_ops < res.num_gates  # fusion must shrink the op list
    assert res.seconds > 0


def test_wide_kh0_pallas_parity():
    """The fused single-pass kh0 kernel (runs of D=128 blocks chained in
    VMEM) matches the XLA 3-matmul path exactly (interpret mode)."""
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline
    from gpu_quantum_simulator_tpu.engine.wide import WideProgram
    from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

    n = 10
    # low-qubit-heavy circuit: fusion emits kh=0 (D=128) blocks, with a few
    # high-qubit gates so mixed kh0-run / XLA-matmul step chains execute
    low = models.grover_like(7, num_gates=260, seed=41)
    c = type(low)(n)
    for i, g in enumerate(low.gates):
        c.gates.append(g)
        if i % 40 == 39:
            c.cx(7, 8).cx(8, 9).h(7)
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    prog = WideProgram(ops, n, jnp.float32, kh0_pallas=True)
    assert prog.num_kh0_runs > 0, "fusion produced no kh0 runs to batch"
    re, im = initial_state_parts(n, dtype=jnp.float32)
    re, im = prog(re, im)
    got = join_state(np.asarray(re), np.asarray(im))
    want = REF.simulate_reference(c)
    assert np.max(np.abs(got - want)) < 2e-5


def test_auto_strategy_dispatch():
    """strategy='auto' resolves per circuit width over the measured
    ladder and reports the resolved engine in RunResult.strategy."""
    from gpu_quantum_simulator_tpu.engine.simulator import _auto_strategy
    from gpu_quantum_simulator_tpu.config import SimulatorConfig

    cfg = SimulatorConfig(strategy="auto")
    assert _auto_strategy(cfg, 12) == "prefetch"
    assert _auto_strategy(cfg, 22) == "prefetch"
    assert _auto_strategy(cfg, 23) == "mxu"
    assert _auto_strategy(cfg, 28) == "mxu"
    assert _auto_strategy(cfg, 30) == "prefetch"
    meshed = SimulatorConfig(strategy="auto", mesh_shape=(2,))
    assert _auto_strategy(meshed, 20) == "sharded"

    c = models.grover_like(11, num_gates=150, seed=4)
    res = Simulator(SimulatorConfig(strategy="auto")).run_detailed(c)
    assert res.strategy == "prefetch"
    want = REF.simulate_reference(c)
    assert np.max(np.abs(res.state - want)) < 2e-5


def test_all_strategies_one_circuit_cross_parity():
    """One deep random circuit through EVERY device strategy (plus
    prefetch-inplace halves and the 8-way sharded mesh) agrees with the
    f64 reference to engine tolerance — the single-sweep composition
    fuzz."""
    import numpy as np

    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    n = 10
    c = models.random_circuit(n, 300, seed=99)
    want = simulate_reference(c)

    for strategy in ("naive", "fused2x2", "fused3in1", "fused4x4",
                     "megakernel", "scan", "mxu", "pallas", "vmem",
                     "prefetch", "auto"):
        got = Simulator(SimulatorConfig(strategy=strategy)).run(c)
        err = float(np.max(np.abs(got - want)))
        assert err < 3e-5, (strategy, err)

    got = Simulator(SimulatorConfig(
        strategy="prefetch", prefetch_inplace=True)).run(c)
    assert float(np.max(np.abs(got - want))) < 3e-5

    got = Simulator(SimulatorConfig(
        strategy="sharded", mesh_shape=(8,))).run(c)
    assert float(np.max(np.abs(got - want))) < 3e-5


def test_plan_cache_skips_refusion(monkeypatch):
    """A repeat run of the same circuit must serve the fused plan from the
    fingerprint cache — never re-fuse (the fusion passes cost ~0.35 s on
    the 2445-gate benchmark circuit, 3x its n=18 device time)."""
    from gpu_quantum_simulator_tpu.engine import simulator as S

    c = models.grover_like(9, num_gates=120, seed=77)
    outs = {}
    for strat in ("mxu", "vmem"):
        sim = Simulator(SimulatorConfig(strategy=strat))
        outs[strat] = np.asarray(sim.run_detailed(c).state)

    def boom(*a, **k):
        raise AssertionError("plan cache missed: circuit was re-fused")

    monkeypatch.setattr(S, "_fuse_pipeline", boom)
    for strat in ("mxu", "vmem"):
        sim = Simulator(SimulatorConfig(strategy=strat))
        again = np.asarray(sim.run_detailed(c).state)
        assert np.max(np.abs(again - outs[strat])) == 0.0
    # appending a gate invalidates: the run must now attempt to re-fuse
    c.h(0)
    with pytest.raises(AssertionError, match="re-fused"):
        Simulator(SimulatorConfig(strategy="mxu")).run_detailed(c)


def test_single_chip_width_ceiling_fails_fast():
    """n > 30 must raise BEFORE any 2^n allocation (an attempt thrashes
    for minutes); the error points at the sharded multi-chip path."""
    c = Circuit(31)
    c.h(0)
    for strat in ("mxu", "prefetch", "naive", "auto"):
        with pytest.raises(ValueError, match="single-chip ceiling"):
            Simulator(SimulatorConfig(strategy=strat)).run(c)
    with pytest.raises(ValueError, match="single-chip ceiling"):
        Simulator(SimulatorConfig(strategy="prefetch")).run_device_halves(c)
