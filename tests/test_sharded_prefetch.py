"""Segmented, recompile-free sharded execution (parallel/sharded_prefetch).

The distributed prefetch engine must (a) match reference amplitudes through
gswap/relayout/block chains on a virtual 8-device mesh, (b) reuse every
chain executable across circuits at the same geometry, (c) keep each chunk
executable's MLIR bounded (the remote compiler rejects ~100 MB payloads),
and (d) plan at n=31 scale (the BASELINE "n >= 30 on a slice" target).
"""

import numpy as np
import pytest

import jax

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator, _fuse_pipeline
from gpu_quantum_simulator_tpu.parallel import sharded_prefetch as SP
from gpu_quantum_simulator_tpu.parallel.mesh import make_mesh
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

TOL = 2e-5


def _simulate_segmented(circuit, **kw):
    sim = Simulator(SimulatorConfig(strategy="sharded", shard_segmented=True,
                                    **kw))
    assert sim._shard_segmented(circuit.num_qubits), "need >= 9 local qubits"
    return sim.run(circuit)


@pytest.mark.parametrize("n,gates,seed", [(12, 300, 1), (13, 400, 5)])
def test_parity_segmented_8way(n, gates, seed):
    c = models.grover_like(n, num_gates=gates, seed=seed)
    got = _simulate_segmented(c)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_gswap_entries_planned_and_exact():
    """Gates on mesh-axis qubits force gswap entries; amplitudes stay exact."""
    n = 12  # 8 devices -> d=3, nl=9: qubits 9..11 live on the mesh
    c = models.grover_like(n, num_gates=250, seed=9)
    mesh = make_mesh(None, ("amp",))
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    prog = SP.ShardedPrefetchProgram(ops, n, mesh, interpret=True,
                                     final_layout=np.arange(n))
    assert prog.plan.num_gswaps > 0
    re, im = prog.init_state()
    re, im = prog(re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_recompile_free_across_circuits():
    """A second circuit at the same (n, mesh) adds NO new chain compiles
    beyond unseen power-of-2 chunk sizes — runtime tables only."""
    n = 12
    c1 = models.grover_like(n, num_gates=260, seed=11)
    c2 = models.grover_like(n, num_gates=270, seed=12)
    got1 = _simulate_segmented(c1)
    chains_after_first = set(SP._SHARD_CHAIN_CACHE)
    got2 = _simulate_segmented(c2)
    new = set(SP._SHARD_CHAIN_CACHE) - chains_after_first
    # any new key may differ only in (num_blocks, cap) — same geometry
    for k in new:
        assert k[0] == "shard" and k[2] == n
    assert np.max(np.abs(got1 - simulate_reference(c1))) < TOL
    assert np.max(np.abs(got2 - simulate_reference(c2))) < TOL


def test_deep_circuit_is_segmented():
    """The 2445-gate benchmark circuit executes as MULTIPLE bounded chunks,
    not one monolithic unroll."""
    n = 12
    c = models.grover_like(n, num_gates=2445, seed=318)
    mesh = make_mesh(None, ("amp",))
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    prog = SP.ShardedPrefetchProgram(ops, n, mesh, interpret=True,
                                     final_layout=np.arange(n))
    assert len(prog.chunk_sizes) >= 2, prog.chunk_sizes
    assert max(prog.chunk_sizes) <= 512
    re, im = prog.init_state()
    re, im = prog(re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_initial_state_resume_segmented():
    n = 12
    c1 = models.grover_like(n, num_gates=150, seed=21)
    c2 = models.grover_like(n, num_gates=150, seed=22)
    sim = Simulator(SimulatorConfig(strategy="sharded", shard_segmented=True))
    mid = sim.run(c1)
    got = sim.run(c2, initial=mid)
    merged = models.grover_like(n, num_gates=150, seed=21)
    merged.gates.extend(c2.gates)
    want = simulate_reference(merged)
    assert np.max(np.abs(got - want)) < TOL


def test_n31_plan_smoke_and_mlir_cap():
    """Plan a deep n=31 circuit over the virtual 8-device mesh (nl=28 — the
    BASELINE scale target) and verify by ABSTRACT lowering that every chunk
    executable's StableHLO stays far under the ~100 MB remote-compile cap.
    Nothing is executed (a 2^31 state does not fit in CI memory)."""
    n = 31
    c = models.grover_like(n, num_gates=400, seed=31)
    mesh = make_mesh(None, ("amp",))
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    # interpret=True: Mosaic lowering needs a TPU backend; the interpreted
    # kernel inlines as plain HLO, which is STRICTLY LARGER than the
    # custom-call form — the cap check stays conservative
    prog = SP.ShardedPrefetchProgram(ops, n, mesh, interpret=True,
                                     final_layout=np.arange(n))
    assert prog.plan.num_gswaps > 0          # 20 mesh-adjacent cold qubits
    assert prog.plan.num_relayouts > 0       # local cross-tile batching
    sizes = prog.lowered_mlir_sizes()
    assert len(sizes) == len(prog.chunk_sizes)
    for s in sizes:
        assert s < 100 * 1024 * 1024, f"chunk MLIR {s} bytes over cap"
    # the whole 400-gate program must stay segmented into bounded chunks
    assert max(prog.chunk_sizes) <= 512


def test_run_device_iterated_segmented():
    """Iterated execution composes layout-closed segmented programs."""
    prefix, body, iters = models.grover_parts(9, marked=3, iterations=4)
    n = body.num_qubits  # 9 + 7 ancillas = 16 -> nl = 13 on 8 devices
    sim = Simulator(SimulatorConfig(strategy="sharded", shard_segmented=True))
    assert sim._shard_segmented(n)
    re, im, _ = sim.run_device_iterated(body, 4, prefix=prefix)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = Simulator(SimulatorConfig(strategy="mxu"))
    re2, im2, _ = ref.run_device_iterated(body, 4, prefix=prefix)
    want = np.asarray(re2) + 1j * np.asarray(im2)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded checkpoint: save mid-run WITHOUT a host gather,
    restore under the same mesh, resume — amplitudes match the one-shot
    run exactly (and the restored arrays carry the mesh sharding)."""
    from gpu_quantum_simulator_tpu.utils.checkpoint import (
        load_state_sharded, save_state_sharded)

    n = 12
    c1 = models.grover_like(n, num_gates=150, seed=21)
    c2 = models.grover_like(n, num_gates=150, seed=22)
    mesh = make_mesh(None, ("amp",))
    ops1 = _fuse_pipeline(c1, 7, max_high=2, window=8)
    prog1 = SP.ShardedPrefetchProgram(ops1, n, mesh, interpret=True,
                                      final_layout=np.arange(n))
    re, im = prog1(*prog1.init_state())
    save_state_sharded(str(tmp_path / "ck"), re, im, n,
                       meta={"circuit": "c1"})

    re2, im2, meta = load_state_sharded(str(tmp_path / "ck"),
                                        mesh=mesh, axis="amp")
    assert meta["num_qubits"] == n and meta["circuit"] == "c1"
    assert re2.sharding.is_equivalent_to(prog1.sharding, re2.ndim)
    ops2 = _fuse_pipeline(c2, 7, max_high=2, window=8)
    prog2 = SP.ShardedPrefetchProgram(ops2, n, mesh, interpret=True,
                                      final_layout=np.arange(n))
    rea, ima = prog2(re2, im2)
    resumed = np.asarray(rea) + 1j * np.asarray(ima)

    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    joint = Circuit(n, c1.gates + c2.gates)
    want = simulate_reference(joint)
    assert np.max(np.abs(resumed - want)) < TOL


def test_sharded_portfolio_parity(monkeypatch):
    """The lookahead-depth portfolio (priced with the ICI gswap term) must
    keep amplitudes exact and pick plancost's minimum over the candidates."""
    from gpu_quantum_simulator_tpu.engine import plancost
    from gpu_quantum_simulator_tpu.engine import prefetch as PF

    n = 12
    c = models.grover_like(n, num_gates=250, seed=23)
    mesh = make_mesh(None, ("amp",))
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    d = 3
    costs = []
    for waves in PF.PLAN_PORTFOLIO:
        plan = SP.plan_prefetch(ops, n, final_layout=np.arange(n),
                                num_global=d, lookahead_waves=waves)
        costs.append(plancost.estimate_plan_sharded(plan, n, d)[0])
    monkeypatch.setattr(PF, "PORTFOLIO_MIN_QUBITS", n)
    prog = SP.ShardedPrefetchProgram(ops, n, mesh, interpret=True,
                                     final_layout=np.arange(n))
    got_cost = plancost.estimate_plan_sharded(prog.plan, n, d)[0]
    assert abs(got_cost - min(costs)) < 1e-12, (got_cost, costs)
    re, im = prog.init_state()
    re, im = prog(re, im)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_precision_high_sharded_parity():
    """precision='high' flows into the shared block kernels (the 3-pass
    bf16 emulation — Mosaic rejects lax.Precision.HIGH); on the CPU mesh
    the emulation executes literally and must stay at bf16-residual
    error, far under the suite tolerance."""
    n = 12
    c = models.grover_like(n, num_gates=300, seed=17)
    got = _simulate_segmented(c, precision="high")
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_deep_wide_register_dispatch_throttle():
    """Regression: n=16 x 1500+ gates DEADLOCKED the in-process CPU backend
    before ShardedPrefetchProgram.__call__ throttled its async chunk queue —
    queued per-device executions from different chunks parked every client
    thread-pool thread inside a collective rendezvous (40 s abort, 7/8
    arrived).  n=12 depth never tripped it, so this pins the failing width.
    Also the deep-and-wide parity case VERDICT r3 #3 asked for."""
    n, gates = 16, 1500
    c = models.grover_like(n, num_gates=gates, seed=318)
    got = _simulate_segmented(c)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL
