"""The "auto" precision rung (round-4 default flip, VERDICT #1).

The prefetch mat step ran at 40-44% of its modeled MXU bound because the
exact-f32 HIGHEST rung is a 6-pass bf16 emulation; the 3-pass "high" rung
was measured 20% faster end-to-end at n=29/30 (bench_artifacts/
precision_ab.json, inplace_knob_ab.json) with a ~4e-7 circuit-level
amplitude error — an order of magnitude inside the BASELINE.md 1e-6 parity
bar.  These tests pin the auto-resolution table, the error budget of the
3-pass emulation (executed literally on CPU: the bf16 splits round for
real), and that every engine accepts the resolved rung.
"""

import numpy as np

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import (
    PRECISION_AUTO_HIGH_MIN_QUBITS,
    SimulatorConfig,
    resolve_precision,
)
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ir.circuit import Circuit


def test_auto_is_the_default():
    cfg = SimulatorConfig()
    assert cfg.precision == "auto"
    assert PRECISION_AUTO_HIGH_MIN_QUBITS == 24


def test_resolution_table():
    lo = PRECISION_AUTO_HIGH_MIN_QUBITS - 1
    hi = PRECISION_AUTO_HIGH_MIN_QUBITS
    assert resolve_precision("auto", lo) == "highest"
    assert resolve_precision("auto", hi) == "high"
    assert resolve_precision("auto", 30) == "high"
    # explicit settings always win, at any width
    for name in ("highest", "high", "default"):
        assert resolve_precision(name, lo) == name
        assert resolve_precision(name, hi) == name
    cfg = SimulatorConfig()
    assert cfg.effective_precision(18) == "highest"
    assert cfg.effective_precision(29) == "high"
    assert SimulatorConfig(precision="highest").effective_precision(30) == \
        "highest"


def test_high_rung_error_budget_deep_circuit():
    """Amp-error bound for the rung that IS the large-n default.

    Since round 5 the 3-pass emulation (engine.prefetch._make_dot) feeds
    the dots bf16-NATIVE operands, so the CPU run rounds every pass's
    operands exactly as the TPU MXU does — including the residual passes,
    which the pre-round-5 form left in f32 on CPU (XLA CPU computes
    DEFAULT dots in full f32), silently understating the decomposition
    error by ~2x.  Faithful budget: ~1.5e-6 at n=12/600 gates — the
    missing ll term plus bf16-rounded residuals, ~2^-16 relative per op
    random-walked over 600 gates (on chip: 7.9e-7 at n=14/600 gates,
    precision_ab.json, same arithmetic).  The >0 leg proves the rounding
    path actually executed.
    """
    c = models.grover_like(12, num_gates=600, seed=41)
    ref = Simulator(SimulatorConfig(strategy="prefetch",
                                    precision="highest")).run(c)
    hi = Simulator(SimulatorConfig(strategy="prefetch",
                                   precision="high")).run(c)
    err = float(np.max(np.abs(np.asarray(hi) - np.asarray(ref))))
    assert 0.0 < err < 4e-6, err


def test_kh0_pallas_high_emulation():
    """The fused kh0 wide kernel's "high" rung (Mosaic has no HIGH dot
    lowering; wide.get_kh0_kernel now carries the same 3-pass bf16
    emulation as the prefetch kernels).  Forced on under interpret mode so
    the emulation is exercised with real bf16 rounding on CPU."""
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline
    from gpu_quantum_simulator_tpu.engine.wide import build_wide_program
    from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts

    n = 10
    rng = np.random.default_rng(3)
    c = Circuit(n)
    for _ in range(120):  # low-qubit gates only: every fused block is kh0
        kind = rng.integers(3)
        q = int(rng.integers(7))
        if kind == 0:
            c.h(q)
        elif kind == 1:
            c.rz(float(rng.uniform(-3, 3)), q)
        else:
            r = int(rng.integers(7))
            if r != q:
                c.cx(q, r)
    ref = Simulator(SimulatorConfig(strategy="reference",
                                    dtype="complex128")).run(c)
    ops = _fuse_pipeline(c, 7, max_high=2)
    re, im = initial_state_parts(n)
    re, im = build_wide_program(ops, n, precision="high",
                                kh0_pallas=True)(re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    err = float(np.max(np.abs(got - ref)))
    assert 0.0 < err < 1e-6, err


def test_mxu_high_parity():
    # the string rung plumbs through the XLA Karatsuba path end-to-end
    c = models.grover_like(10, num_gates=300, seed=9)
    ref = Simulator(SimulatorConfig(strategy="reference",
                                    dtype="complex128")).run(c)
    got = Simulator(SimulatorConfig(strategy="mxu", precision="high")).run(c)
    err = float(np.max(np.abs(np.asarray(got) - ref)))
    assert err < 1e-6, err


def test_auto_matches_explicit_below_threshold():
    # below the flip width, auto == highest bit-for-bit (same plan cache key)
    c = models.grover_like(10, num_gates=200, seed=13)
    a = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    b = Simulator(SimulatorConfig(strategy="prefetch",
                                  precision="highest")).run(c)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
