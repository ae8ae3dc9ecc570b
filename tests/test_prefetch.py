"""Prefetch engine: parity, planning invariants, recompile-free property.

The prefetch strategy must produce reference-exact amplitudes through every
mechanism it composes: in-window 256x256 matmuls, in-tile row swaps
(tswaps), lane<->window permutation steps, cross-tile input-prologue swaps
(xswaps), and the scan chains over stacked tables.  CPU runs use
interpret-mode Pallas (hermetic, no TPU).
"""

import os

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator, _fuse_pipeline
from gpu_quantum_simulator_tpu.engine import prefetch as PF
from gpu_quantum_simulator_tpu.passes.fuse4x4 import fuse_4x4
from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k
from gpu_quantum_simulator_tpu.passes.permute import unpermute_state
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

TOL = 2e-5


def _run_prefetch(circuit):
    return Simulator(SimulatorConfig(strategy="prefetch")).run(circuit)


@pytest.mark.parametrize("n,gates,seed", [(9, 120, 0), (11, 300, 3), (12, 400, 7)])
def test_parity_random(n, gates, seed):
    c = models.grover_like(n, num_gates=gates, seed=seed)
    got = _run_prefetch(c)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_parity_small_n_fallback():
    # n < MIN_QUBITS routes through the megakernel path
    c = models.grover_like(6, num_gates=80, seed=2)
    got = _run_prefetch(c)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_parity_bell_and_ghz():
    got = _run_prefetch(models.ghz(10))
    assert abs(got[0] - 1 / np.sqrt(2)) < TOL
    assert abs(got[-1] - 1 / np.sqrt(2)) < TOL


def test_tiny_caps_force_flushes():
    """Capacity-1 blocks exercise every flush path yet stay exact."""
    n = 10
    c = models.grover_like(n, num_gates=200, seed=5)
    ops = _fuse_pipeline(c, 7, max_high=2)
    prog = PF.PrefetchProgram(ops, n, cap_steps=3, cap_mats=1, interpret=True)
    import jax.numpy as jnp
    from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

    re, im = initial_state_parts(n, dtype=jnp.float32)
    re, im = prog(re, im)
    state = join_state(np.asarray(re), np.asarray(im))
    state = unpermute_state(state, prog.final_position)
    want = simulate_reference(c)
    assert np.max(np.abs(state - want)) < TOL


def test_xswap_prologue_path():
    """Small tile (cap on TILE via small n is impossible) — instead force
    cross-tile swaps by planning at a qubit count whose top bits exceed the
    tile span: n=18 has R2=1024 rows and T=512, so position 17 swaps must
    ride the input prologue.  Plan-level check only (no 2^18 execution)."""
    n = 18
    c = models.grover_like(n, num_gates=400, seed=11)
    ops = _fuse_pipeline(c, 7, max_high=2)
    plan = PF.plan_prefetch(ops, n)
    assert plan.num_xswaps > 0
    assert any(b.prologue is not None for b in plan.blocks)
    # prologue shift/tmask target the single above-tile bit
    logt = plan.logt
    for b in plan.blocks:
        if b.prologue is not None:
            tmask, shift = b.prologue
            assert tmask == 1 << shift
            assert shift >= 0


def test_xswap_execution_parity():
    """Execute a plan that contains real prologue swaps, via a shrunken
    TILE: monkeypatch TILE_ROWS so even n=12 has cross-tile bits."""
    n = 12
    old = PF.TILE_ROWS
    PF.TILE_ROWS = 4  # R2 = 16 rows -> 4 tiles, bits above 2 are cross-tile
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n)
        assert plan.num_xswaps > 0, "test needs the prologue path exercised"
        prog = PF.PrefetchProgram(ops, n, interpret=True)
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

        re, im = initial_state_parts(n, dtype=jnp.float32)
        re, im = prog(re, im)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position
        )
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS = old
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_recompile_free_across_circuits():
    """Two different circuits of the same width share every executable."""
    n = 11
    c1 = models.grover_like(n, num_gates=250, seed=21)
    c2 = models.grover_like(n, num_gates=260, seed=22)
    got1 = _run_prefetch(c1)
    kernels_after_first = dict(PF._KERNEL_CACHE)
    chains_after_first = set(PF._CHAIN_CACHE)
    got2 = _run_prefetch(c2)
    # no new kernel compiles for the second circuit; chains may add only
    # power-of-2 sizes not seen yet (num_blocks sits 3rd-from-last in the
    # chain key, ahead of the stream/mat-kernel routing flags)
    assert dict(PF._KERNEL_CACHE) == kernels_after_first
    new_chains = set(PF._CHAIN_CACHE) - chains_after_first
    assert all(isinstance(k[-3], int) for k in new_chains)
    assert np.max(np.abs(got1 - simulate_reference(c1))) < TOL
    assert np.max(np.abs(got2 - simulate_reference(c2))) < TOL


def test_expand_local_matches_expand_unitary():
    from gpu_quantum_simulator_tpu.ir.oplist import expand_unitary, permute_basis

    rng = np.random.default_rng(0)
    for k in (1, 2, 3):
        q, _ = np.linalg.qr(
            rng.standard_normal((1 << k, 1 << k))
            + 1j * rng.standard_normal((1 << k, 1 << k))
        )
        positions = tuple(int(p) for p in rng.permutation(8)[:k])
        out_re = np.zeros((256, 256), dtype=np.float32)
        out_im = np.zeros((256, 256), dtype=np.float32)
        PF._expand_local_into(q, positions, out_re, out_im)
        # reference: sort positions, permute basis, expand over window
        order = np.argsort(positions)
        sp = tuple(int(positions[i]) for i in order)
        u_sorted = permute_basis(q, list(positions), list(sp))
        big = expand_unitary(u_sorted, sp, tuple(range(8)))
        np.testing.assert_allclose(out_re, big.real.T.astype(np.float32), atol=1e-6)
        np.testing.assert_allclose(out_im, big.imag.T.astype(np.float32), atol=1e-6)


def test_initial_state_resume():
    """prefix then resume must equal the full run (checkpoint parity)."""
    n = 10
    full = models.grover_like(n, num_gates=200, seed=31)
    first = models.circuits.Circuit(n)
    second = models.circuits.Circuit(n)
    first.gates = full.gates[:100]
    second.gates = full.gates[100:]
    sim = Simulator(SimulatorConfig(strategy="prefetch"))
    mid = sim.run(first)
    got = sim.run(second, initial=mid)
    want = simulate_reference(full)
    assert np.max(np.abs(got - want)) < TOL


def test_complex128_rejected():
    c = models.grover_like(10, num_gates=50, seed=1)
    with pytest.raises(ValueError, match="float32-only"):
        Simulator(SimulatorConfig(strategy="prefetch", dtype="complex128")).run(c)


def test_inplace_split_parity():
    """In-place (aliased split-half) mode: block kernel + standalone
    pair-grid xswap entries must match the reference exactly.  TILE_ROWS
    is shrunk so n=12 exercises real cross-tile swaps."""
    n = 12
    old = PF.TILE_ROWS
    PF.TILE_ROWS = 4
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n)
        assert plan.num_xswaps > 0, "test needs the pair-swap path exercised"
        prog = PF.PrefetchProgram(ops, n, interpret=True, inplace=True)
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

        re, im = initial_state_parts(n, dtype=jnp.float32)
        re, im = prog(re, im)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position
        )
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS = old
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_inplace_simulator_route():
    """strategy='prefetch' with prefetch_inplace=True end-to-end (original
    basis restored in-plan) equals the default engine output."""
    n = 11
    c = models.grover_like(n, num_gates=250, seed=17)
    got = Simulator(
        SimulatorConfig(strategy="prefetch", prefetch_inplace=True)
    ).run(c)
    want = simulate_reference(c)
    assert np.max(np.abs(got - want)) < TOL


def test_run_device_halves_and_halves_measurement():
    """Split-half output path + halves-native norm/sampling (the n>=30
    representation) against the flat reference."""
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu.sampling import (
        norm_halves, sample_halves, sample_state_device)

    n = 11
    c = models.grover_like(n, num_gates=250, seed=41)
    sim = Simulator(SimulatorConfig(strategy="prefetch", prefetch_inplace=True))
    parts, nops = sim.run_device_halves(c)
    assert nops > 0
    assert abs(float(norm_halves(*parts)) - 1.0) < 1e-5

    # flat state from the plain engine for comparison
    flat = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    re0, re1, im0, im1 = (np.asarray(p) for p in parts)
    got = (np.concatenate([re0, re1], axis=1).reshape(-1)
           + 1j * np.concatenate([im0, im1], axis=1).reshape(-1))
    assert np.max(np.abs(got - flat)) < 2e-5

    # sampling distributions agree (same seed, same outcomes modulo sampler
    # staging: compare empirical marginals instead of raw draws)
    s_h = sample_halves(*parts, n, 4000, 7)
    p = np.abs(flat) ** 2
    top = np.argsort(p)[-4:]
    for idx in top:
        frac = np.mean(s_h == idx)
        assert abs(frac - p[idx]) < 0.05


def test_run_device_halves_requires_inplace():
    c = models.grover_like(10, num_gates=50, seed=1)
    sim = Simulator(SimulatorConfig(strategy="prefetch"))
    with pytest.raises(ValueError, match="in-place"):
        sim.run_device_halves(c)


def test_relayout_kernel_unit():
    """The multi-bit relayout kernel applies exactly the planned bit
    permutation (checked against a numpy bit-shuffle oracle)."""
    import jax.numpy as jnp

    n = 11
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        relay = PF.get_relayout_kernel(n, np.float32, True)
        m = n - PF.LOCAL_QUBITS  # exposed: all row-block bits (Tr = 1)
        rng = np.random.default_rng(0)
        v = rng.standard_normal(1 << n).astype(np.float32)
        w = rng.standard_normal(1 << n).astype(np.float32)
        # sigma: qubit at exposed slot a -> exposed slot sigma[a]
        sigma = np.array([2, 0, 1] + list(range(3, m)), dtype=np.int32)
        scal = np.zeros(4 + 2 * PF.CAP_STEPS, dtype=np.int32)
        scal[1] = 3
        scal[4 : 4 + m] = sigma
        R2 = 1 << (n - PF.LOCAL_QUBITS)
        ore, oim = relay(jnp.asarray(scal),
                         jnp.asarray(v.reshape(R2, PF.DVIEW)),
                         jnp.asarray(w.reshape(R2, PF.DVIEW)))
        # oracle: exposed slot a = qubit 8 + a; qubit at slot a moves to
        # slot sigma[a]
        pos = [8 + a for a in range(m)]
        perm = list(range(n))
        for a in range(m):
            perm[pos[a]] = pos[sigma[a]]  # new bit position of old bit
        idx = np.arange(1 << n)
        src = np.zeros(1 << n, dtype=np.int64)
        for b in range(n):
            src |= ((idx >> perm[b]) & 1) << b
        np.testing.assert_array_equal(np.asarray(ore).reshape(-1), v[src])
        np.testing.assert_array_equal(np.asarray(oim).reshape(-1), w[src])
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_relayout_execution_parity():
    """End-to-end parity of a plan that contains multi-qubit relayout
    entries (shrunken tiles so n=12 has cross-tile bits AND >= 2 parks)."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n)
        assert plan.num_relayouts > 0, "test needs the relayout path"
        prog = PF.PrefetchProgram(ops, n, interpret=True)
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

        re, im = initial_state_parts(n, dtype=jnp.float32)
        re, im = prog(re, im)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position
        )
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_relayout_final_layout_restore():
    """final_layout routing stays exact when the restore itself uses a
    relayout pass (identity layout requested; state must be original-basis
    with no residual)."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=17)
        got = _run_prefetch(c)   # facade: relabel + in-plan restore
        want = simulate_reference(c)
        assert np.max(np.abs(got - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_dispatch_budget_chunks():
    """No single chain dispatch may exceed the watchdog budget of
    blocks x grid-steps (a ~65 s single execution at n=29 crashed the TPU
    worker; the same blocks pass as smaller dispatches — prefetch.py
    DISPATCH_GRID_BUDGET)."""
    # unit: _chunks respects max_chunk including the round-up branch
    assert PF._chunks(512, 128) == [128, 128, 128, 128]
    assert PF._chunks(576, 128) == [128] * 4 + [64]
    assert PF._chunks(5, 128) == [8] or sum(PF._chunks(5, 128)) >= 5
    assert max(PF._chunks(1000, 64)) <= 64
    # planning: a deep n=29 flat plan must chunk to <= 2^19 / (R2 / T)
    n = 29
    c = models.grover_like(n, num_gates=2445, seed=29)
    ops = _fuse_pipeline(c, 7, max_high=2, window=8)
    plan = PF.plan_prefetch(ops, n, PF.CAP_STEPS, 4, reorder=True,
                            allow_relayout=True)
    grid_rows = (1 << (n - PF.LOCAL_QUBITS)) // PF.tile_rows(n)
    budget = max(32, PF.DISPATCH_GRID_BUDGET // grid_rows)
    for _, sizes, *_ in PF.materialize_entries(
            plan.blocks, PF.CAP_STEPS, 4, np.dtype(np.float32),
            single_class=True, max_chunk=budget):
        assert max(sizes) <= budget, sizes


def test_inplace_relayout_kernel_unit():
    """The in-place pair-swap relayout kernel applies an involution sigma
    exactly (numpy bit-shuffle oracle), in the state's own buffers."""
    import jax.numpy as jnp

    n = 11
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        relay = PF.get_inplace_relayout_kernel(n, np.float32, True)
        m = n - PF.LOCAL_QUBITS
        rng = np.random.default_rng(1)
        state = (rng.standard_normal(1 << n)
                 + 1j * rng.standard_normal(1 << n))
        # involution: swap slots 0<->2, fix the rest
        sigma = np.array([2, 1, 0] + list(range(3, m)), dtype=np.int32)
        scal = np.zeros(4 + 2 * PF.CAP_STEPS, dtype=np.int32)
        scal[1] = 3
        scal[4 : 4 + m] = sigma
        from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts
        re = np.ascontiguousarray(state.real.astype(np.float32))
        im = np.ascontiguousarray(state.imag.astype(np.float32))
        R2 = 1 << (n - PF.LOCAL_QUBITS)
        re0, re1 = [np.ascontiguousarray(h) for h in
                    np.split(re.reshape(R2, PF.DVIEW), 2, axis=1)]
        im0, im1 = [np.ascontiguousarray(h) for h in
                    np.split(im.reshape(R2, PF.DVIEW), 2, axis=1)]
        o = relay(jnp.asarray(scal), jnp.asarray(re0), jnp.asarray(re1),
                  jnp.asarray(im0), jnp.asarray(im1))
        got = (np.concatenate([np.asarray(o[0]), np.asarray(o[1])], axis=1)
               .reshape(-1)
               + 1j * np.concatenate([np.asarray(o[2]), np.asarray(o[3])],
                                     axis=1).reshape(-1))
        pos = [8 + a for a in range(m)]
        perm = list(range(n))
        for a in range(m):
            perm[pos[a]] = pos[sigma[a]]
        idx = np.arange(1 << n)
        src = np.zeros(1 << n, dtype=np.int64)
        for b in range(n):
            src |= ((idx >> perm[b]) & 1) << b
        np.testing.assert_allclose(got, state[src].astype(np.complex64),
                                   rtol=0, atol=0)
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_involution_split():
    """plan_prefetch with involution_relayout splits a 3-cycle restore
    bijection into two involutions whose composition is the original."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n, involution_relayout=True)
        assert plan.num_relayouts > 0
        m = n - PF.LOCAL_QUBITS  # Tr = 1: all row-block bits exposed
        for blk in plan.blocks:
            if blk.relayout is not None:
                sig = np.asarray(blk.relayout)
                np.testing.assert_array_equal(sig[sig], np.arange(len(sig)))
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r


def test_inplace_relayout_execution_parity():
    """End-to-end parity of the ALIASED engine on a plan that contains
    relayout entries (shrunken tiles force the path at n=12)."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n, involution_relayout=True)
        assert plan.num_relayouts > 0, "test needs the relayout path"
        prog = PF.PrefetchProgram(ops, n, interpret=True, inplace=True)
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import join_state
        from gpu_quantum_simulator_tpu.engine.prefetch import (
            initial_halves, join_halves)

        parts = initial_halves(n, jnp.float32)
        re0, re1, im0, im1 = prog.run_parts(*parts)
        re, im = join_halves(re0, re1, im0, im1)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position
        )
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


@pytest.mark.skipif(
    bool(int(os.environ.get("QSIM_MONO_AS_MAT", "0"))),
    reason="mono steps disabled by the QSIM_MONO_AS_MAT A/B knob")
def test_mono_step_used_and_exact():
    """cx/x/rz-only circuits fuse to MONOMIAL ops; the plan must lower
    them to the 2-matmul mono step kind and stay exact vs the reference."""
    n = 10
    c = models.Circuit(n) if hasattr(models, "Circuit") else None
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    rng = np.random.default_rng(7)
    c = Circuit(n)
    for _ in range(200):
        k = rng.integers(0, 3)
        if k == 0:
            a, b = rng.choice(n, 2, replace=False)
            c.cx(int(a), int(b))
        elif k == 1:
            c.x(int(rng.integers(0, n)))
        else:
            c.rz(float(rng.uniform(0, 2 * np.pi)), int(rng.integers(0, n)))
    ops = _fuse_pipeline(c, 7, max_high=2)
    plan = PF.plan_prefetch(ops, n)
    kind_mono = plan.logt + 2
    nmono = sum(1 for b in plan.blocks for k in b.kinds if k == kind_mono)
    nmat = sum(1 for b in plan.blocks for k in b.kinds if k == 0)
    assert nmono > 0 and nmono >= nmat, (nmono, nmat)
    prog = PF.PrefetchProgram(ops, n, interpret=True)
    from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts, join_state

    re, im = initial_state_parts(n, dtype=np.float32)
    re, im = prog(re, im)
    state = unpermute_state(
        join_state(np.asarray(re), np.asarray(im)), prog.final_position)
    want = simulate_reference(c)
    assert np.max(np.abs(state - want)) < TOL


@pytest.mark.parametrize("tile_rows", [4, 8, 16])
def test_stream_plain_kernel_parity(tile_rows):
    """Plain blocks routed through the manual streaming DMA kernel
    (QSIM_STREAM_PLAIN) match the reference exactly.  Shrunken tiles at
    n=12 exercise the full W-deep window (nt=4), the shallow nt=2
    boundary, and the degenerate single-tile W=1 form; xswap-prologue
    blocks stream too (steered input copies), so the mixed chain is
    covered end to end."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    old_stream = PF._STREAM_PLAIN
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = tile_rows, 1
    PF._STREAM_PLAIN = True
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        prog = PF.PrefetchProgram(ops, n, interpret=True)
        assert ("stream", n) == tuple(
            k[:2] for k in PF._KERNEL_CACHE if k[0] == "stream")[0]
        from gpu_quantum_simulator_tpu.ops.apply import (
            initial_state_parts, join_state)

        re, im = initial_state_parts(n, dtype=np.float32)
        re, im = prog(re, im)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position)
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._STREAM_PLAIN = old_stream
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_fold_relayout_entries_unit():
    """The fold pass merges (standalone relayout, following plain step
    block) pairs into one mode-5 block and leaves unmergeable shapes
    (prologue on the next block, trailing relayout) standalone."""
    sig = np.array([1, 0], dtype=np.int32)
    mk_plain = lambda: PF._Block(kinds=[0], midx=[0],
                                 mats=[(np.eye(2), (0,), None)])
    out = PF._fold_relayout_entries([PF._Block(relayout=sig), mk_plain()])
    assert len(out) == 1
    assert out[0].relayout_pro is sig and out[0].kinds == [0]
    assert out[0].relayout is None
    # next block already carries an xswap prologue: no fold
    pro = mk_plain()
    pro.prologue = (1, 0)
    out = PF._fold_relayout_entries([PF._Block(relayout=sig), pro])
    assert len(out) == 2 and out[0].relayout is sig
    # trailing relayout stays standalone
    out = PF._fold_relayout_entries([mk_plain(), PF._Block(relayout=sig)])
    assert len(out) == 2 and out[1].relayout is sig
    # back-to-back relayouts: only the second can fold forward
    out = PF._fold_relayout_entries(
        [PF._Block(relayout=sig), PF._Block(relayout=sig), mk_plain()])
    assert len(out) == 2
    assert out[0].relayout is sig and out[1].relayout_pro is sig


@pytest.mark.parametrize("n,t_rows,relayout_rows", [(12, 4, 1), (13, 8, 2)])
def test_stream_relayout_fold_parity(n, t_rows, relayout_rows):
    """QSIM_STREAM_RELAYOUT folds standalone relayout passes into the next
    plain block's streamed input copies (scal mode 5, Tr-granular reads
    sourced through sigma) with exact end-to-end parity.  Shrunken tiles
    force the relayout path; the two geometries cover K = T/Tr of 4 input
    copies per tile (sub-tile sources) and Tr straddling tile boundaries.
    The materialized chain must contain folded rows and strictly fewer
    standalone relayout entries than the plan emitted."""
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    old_sr = PF._STREAM_RELAYOUT
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = t_rows, relayout_rows
    PF._STREAM_RELAYOUT = True
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n)
        assert plan.num_relayouts > 0, "test needs the relayout path"
        rows = np.concatenate([m[2] for m in PF.materialize_entries(
            plan.blocks, PF.CAP_STEPS, PF.CAP_MATS, np.dtype(np.float32),
            fold_relayout=True)])
        assert (rows[:, 1] == 5).sum() >= 1, "no folded relayout rows"
        assert (rows[:, 1] == 3).sum() < plan.num_relayouts
        prog = PF.PrefetchProgram(ops, n, interpret=True)
        from gpu_quantum_simulator_tpu.ops.apply import (
            initial_state_parts, join_state)

        re, im = initial_state_parts(n, dtype=np.float32)
        re, im = prog(re, im)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position)
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._STREAM_RELAYOUT = old_sr
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_stream_relayout_iterated():
    """iterate_program composes correctly when the chain carries folded
    relayout rows (QSIM_STREAM_RELAYOUT): two scanned repetitions of a
    layout-closed program equal the doubled circuit."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    old_sr = PF._STREAM_RELAYOUT
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    PF._STREAM_RELAYOUT = True
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=60, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        plan = PF.plan_prefetch(ops, n, final_layout=np.arange(n))
        assert plan.num_relayouts > 0, "test needs the relayout path"
        prog = PF.PrefetchProgram(ops, n, interpret=True,
                                  final_layout=np.arange(n))
        from gpu_quantum_simulator_tpu.ops.apply import (
            initial_state_parts, join_state)

        re, im = initial_state_parts(n, dtype=np.float32)
        re, im = PF.iterate_program(prog, 2)(re, im)
        got = join_state(np.asarray(re), np.asarray(im))
        doubled = c.compose(c)
        want = simulate_reference(doubled)
        assert np.max(np.abs(got - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._STREAM_RELAYOUT = old_sr
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_stream_relayout_final_layout_restore():
    """The facade path (relabel + in-plan restore) stays exact under
    QSIM_STREAM_RELAYOUT — the restore's own relayout pass may fold too."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    old_sr = PF._STREAM_RELAYOUT
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = 4, 1
    PF._STREAM_RELAYOUT = True
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=17)
        got = _run_prefetch(c)
        want = simulate_reference(c)
        assert np.max(np.abs(got - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._STREAM_RELAYOUT = old_sr
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


@pytest.mark.parametrize("tile_rows", [4, 8])
def test_stream_split_kernel_parity(tile_rows):
    """The ALIASED in-place chain with blocks routed through the manual
    streaming split kernel (QSIM_STREAM_PLAIN) stays exact on a plan with
    xswap and relayout entries interleaved between streamed blocks."""
    n = 12
    old_t, old_r = PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS
    old_stream = PF._STREAM_PLAIN
    PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = tile_rows, 1
    PF._STREAM_PLAIN = True
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=13)
        ops = _fuse_pipeline(c, 7, max_high=2)
        prog = PF.PrefetchProgram(ops, n, interpret=True, inplace=True)
        assert any(k[0] == "stream-split" for k in PF._KERNEL_CACHE)
        # pair-mode coverage: the plan's xswaps must ride blocks (flag 1)
        # instead of standalone pair-grid entries (flag 2)
        flags = [int(f) for part in prog._host_parts for f in part[3][:, 1]]
        assert 1 in flags and 2 not in flags, flags
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import join_state
        from gpu_quantum_simulator_tpu.engine.prefetch import (
            initial_halves, join_halves)

        parts = initial_halves(n, jnp.float32)
        re0, re1, im0, im1 = prog.run_parts(*parts)
        re, im = join_halves(re0, re1, im0, im1)
        state = unpermute_state(
            join_state(np.asarray(re), np.asarray(im)), prog.final_position)
        want = simulate_reference(c)
        assert np.max(np.abs(state - want)) < TOL
    finally:
        PF.TILE_ROWS, PF.RELAYOUT_TILE_ROWS = old_t, old_r
        PF._STREAM_PLAIN = old_stream
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_plan_knob_overrides_parity():
    """prefetch_max_high / prefetch_cap_mats change the plan shape but
    never the amplitudes (the plan_model --tune A/B hook)."""
    c = models.grover_like(11, num_gates=250, seed=13)
    want = simulate_reference(c)
    for max_high, cap_mats in ((1, 12), (2, 2), (3, 8)):
        got = Simulator(SimulatorConfig(
            strategy="prefetch", prefetch_max_high=max_high,
            prefetch_cap_mats=cap_mats)).run(c)
        assert np.max(np.abs(got - want)) < TOL, (max_high, cap_mats)


def test_plan_knob_env_fallback(monkeypatch):
    monkeypatch.setenv("QSIM_PREFETCH_MAX_HIGH", "1")
    monkeypatch.setenv("QSIM_PREFETCH_CAP_MATS", "12")
    cfg = SimulatorConfig(strategy="prefetch")
    assert PF.resolve_prefetch_knobs(cfg, 24, False) == (1, 12, 16)
    # explicit config wins over env
    cfg2 = SimulatorConfig(strategy="prefetch", prefetch_max_high=3,
                           prefetch_cap_mats=2)
    assert PF.resolve_prefetch_knobs(cfg2, 24, False) == (3, 2, 16)
    monkeypatch.delenv("QSIM_PREFETCH_MAX_HIGH")
    monkeypatch.delenv("QSIM_PREFETCH_CAP_MATS")
    # measured defaults: n >= 21 flat (knob_ab.log) and n >= 29 in-place
    # (inplace_knob_ab n30knobs) get window=16 + cap_mats=8; small-n
    # forced-in-place and n < 21 flat keep window 8
    assert PF.resolve_prefetch_knobs(cfg, 24, False) == (2, 8, 16)
    assert PF.resolve_prefetch_knobs(cfg, 24, True) == (2, PF.CAP_MATS, 8)
    assert PF.resolve_prefetch_knobs(cfg, 30, True) == (2, 8, 16)
    assert PF.resolve_prefetch_knobs(cfg, 18, False) == (2, PF.CAP_MATS, 8)


def test_mono_as_mat_auto_scope():
    """Auto mono lowering covers exactly the measured regimes: flat
    single-chip plans at n >= 21 (knob_ab 2026-08-19) and in-place
    halves chains at n >= 29 (inplace_knob_ab n30knobs); small-n
    forced-in-place and sharded plans keep the mono step; forcing the
    global wins."""
    old = PF.MONO_AS_MAT
    try:
        PF.MONO_AS_MAT = None
        assert PF.resolve_mono_as_mat(24, False)
        assert not PF.resolve_mono_as_mat(18, False)
        assert not PF.resolve_mono_as_mat(24, True)          # in-place, small
        assert PF.resolve_mono_as_mat(30, True)              # in-place, n>=29
        assert not PF.resolve_mono_as_mat(30, True, num_global=3)
        assert not PF.resolve_mono_as_mat(24, False, num_global=3)
        PF.MONO_AS_MAT = False
        assert not PF.resolve_mono_as_mat(24, False)
        PF.MONO_AS_MAT = True
        assert PF.resolve_mono_as_mat(18, False)
    finally:
        PF.MONO_AS_MAT = old


def test_mono_as_mat_plan_parity():
    """The mat-lowered plan of a monomial-heavy circuit must execute to
    the same amplitudes as the mono-step plan, and the packer must follow
    the PLAN's arm (plan.mono_as_mat), not the global at pack time."""
    n = 10
    c = models.grover_like(n, num_gates=200, seed=23)
    want = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    old = PF.MONO_AS_MAT
    try:
        PF.MONO_AS_MAT = True
        PF._RUN_CACHE.clear()
        got = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    finally:
        PF.MONO_AS_MAT = old
        PF._RUN_CACHE.clear()
    assert np.max(np.abs(got - want)) < TOL
    ops = _fuse_pipeline(c, 7, max_high=2)
    plan = PF.plan_prefetch(ops, n, mono_as_mat=True)
    assert plan.mono_as_mat
    kind_mono = plan.logt + 2
    assert all(k != kind_mono for b in plan.blocks for k in b.kinds)


def test_lookahead_waves_parity():
    """Any lookahead depth must plan a semantically identical circuit:
    execute the same workload at several depths and compare amplitudes."""
    n = 12
    old = PF.TILE_ROWS
    PF.TILE_ROWS = 4  # expose cross-tile bits so the reorder path runs
    try:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()
        c = models.grover_like(n, num_gates=300, seed=17)
        want = simulate_reference(c)
        ops = _fuse_pipeline(c, 7, max_high=2)
        import jax.numpy as jnp
        from gpu_quantum_simulator_tpu.ops.apply import (
            initial_state_parts, join_state)

        for waves in (1, 3, 6):
            plan = PF.plan_prefetch(ops, n, lookahead_waves=waves)
            assert plan.num_ops == len(ops)
            prog = PF.PrefetchProgram(ops, n, interpret=True)
            re, im = initial_state_parts(n, dtype=jnp.float32)
            re, im = prog(re, im)
            state = unpermute_state(
                join_state(np.asarray(re), np.asarray(im)),
                prog.final_position)
            assert np.max(np.abs(state - want)) < TOL, waves
    finally:
        PF.TILE_ROWS = old
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_plan_portfolio_picks_model_minimum(monkeypatch):
    """plan_prefetch_best returns the candidate the cost model prices
    cheapest, and PrefetchProgram routes through it above the width gate."""
    from gpu_quantum_simulator_tpu.engine import plancost

    n = 18
    c = models.grover_like(n, num_gates=400, seed=19)
    ops = _fuse_pipeline(c, 7, max_high=2)
    costs = {}
    for waves in PF.PLAN_PORTFOLIO:
        plan = PF.plan_prefetch(ops, n, lookahead_waves=waves)
        costs[waves] = plancost.estimate_plan(plan, n)[0]
    best = PF.plan_prefetch_best(ops, n)
    got, _ = plancost.estimate_plan(best, n)
    assert abs(got - min(costs.values())) < 1e-12, costs

    # the engine consults the portfolio above PORTFOLIO_MIN_QUBITS: plan
    # shape through PrefetchProgram matches plan_prefetch_best's choice
    monkeypatch.setattr(PF, "PORTFOLIO_MIN_QUBITS", n)
    prog = PF.PrefetchProgram(ops, n, interpret=True)
    assert prog.num_blocks == len(best.blocks)


def test_plan_cost_regression_guard_n24():
    """Planner regression guard: the calibrated cost model's estimate for
    the standard n=24 grover-profile plan stays in the round-3 band.
    (Measured on-chip ~2.5 s; model ~2.1-2.2 s with round-3 scheduling.
    A scheduler regression to the pre-round-3 one-op-per-block shape
    models at >6 s.)  Structure bounds guard the same property."""
    from gpu_quantum_simulator_tpu.engine import plancost
    from gpu_quantum_simulator_tpu.engine.prefetch import plan_prefetch_best
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline

    c = models.grover_like(24, num_gates=2445, seed=318)
    ops = _fuse_pipeline(c, 7, max_high=1, window=8)
    plan = plan_prefetch_best(ops, 24)
    secs, parts = plancost.estimate_plan(plan, 24)
    assert secs < 3.5, (secs, parts)
    n_blocks = len(plan.blocks)
    assert plan.num_ops / n_blocks > 1.8, (plan.num_ops, n_blocks)


def test_precision_high_emulation_parity():
    # Mosaic has no HIGH dot lowering (precision_ab.log 2026-08-19); the
    # engine emulates the 3-pass bf16 rung in _make_dot/_make_pdot.  On
    # CPU interpret the emulation executes literally: the only error is
    # the bf16 residual rounding, which must stay far under the DEFAULT
    # rung's ~1e-4/gate and within the suite tolerance of the exact run.
    c = models.grover_like(10, num_gates=300, seed=7)
    ref = Simulator(SimulatorConfig(strategy="prefetch",
                                    precision="highest")).run(c)
    hi = Simulator(SimulatorConfig(strategy="prefetch",
                                   precision="high")).run(c)
    err = float(np.max(np.abs(np.asarray(hi) - np.asarray(ref))))
    assert err < TOL, err


def test_precision_high_inplace_halves():
    # same ladder through the split-halves step interpreter (bpdot path)
    n = 10
    c = models.grover_like(n, num_gates=200, seed=5)
    ref = Simulator(SimulatorConfig(strategy="prefetch",
                                    precision="highest")).run(c)
    sim = Simulator(SimulatorConfig(strategy="prefetch", precision="high",
                                    prefetch_inplace=True))
    out = sim.run(c)
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(ref))))
    assert err < TOL, err


@pytest.mark.parametrize("form", ["schoolbook", "block"])
@pytest.mark.parametrize("inplace", [False, True])
def test_mat_kernel_forms_parity(form, inplace, monkeypatch):
    """The alternative complex mat-step forms (QSIM_MAT_KERNEL) are exact
    rewrites of the Karatsuba default: schoolbook = 4 independent dots,
    block = one (T, 512) x (512, 512) dot against the [[a, b], [-b, a]]
    real embedding.  Both step interpreters (flat + split halves) must
    match the f64 reference through every step kind they compose with."""
    monkeypatch.setenv("QSIM_MAT_KERNEL", form)
    PF._KERNEL_CACHE.clear()
    PF._CHAIN_CACHE.clear()
    try:
        n = 11
        c = models.grover_like(n, num_gates=300, seed=21)
        got = Simulator(SimulatorConfig(
            strategy="prefetch", prefetch_inplace=inplace)).run(c)
        want = simulate_reference(c)
        assert np.max(np.abs(got - want)) < TOL
    finally:
        PF._KERNEL_CACHE.clear()
        PF._CHAIN_CACHE.clear()


def test_resolve_stream_relayout_defaults(monkeypatch):
    """Fold default: ON for flat plans at n >= 23 (diag24.json round 5:
    exec 1.687 vs 1.802 s at n=24, 7.234 vs 7.808 s at n=26), OFF below
    and for in-place plans; both env and module-var overrides win."""
    monkeypatch.setattr(PF, "_STREAM_RELAYOUT", None)
    assert not PF.resolve_stream_relayout(18)
    assert not PF.resolve_stream_relayout(22)
    assert PF.resolve_stream_relayout(23)
    assert PF.resolve_stream_relayout(26)
    assert not PF.resolve_stream_relayout(30, inplace=True)
    monkeypatch.setattr(PF, "_STREAM_RELAYOUT", False)  # A/B scripts
    assert not PF.resolve_stream_relayout(26)
    monkeypatch.setattr(PF, "_STREAM_RELAYOUT", True)
    assert PF.resolve_stream_relayout(12)
