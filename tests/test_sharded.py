"""Multi-chip sharded engine on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator
from gpu_quantum_simulator_tpu.ir.oplist import circuit_to_ops
from gpu_quantum_simulator_tpu.passes.shard import plan_sharded, SwapItem
from gpu_quantum_simulator_tpu.ref import cpu as REF

TOL = 2e-5


def _run(circuit, mesh_shape=None, **kw):
    cfg = SimulatorConfig(strategy="sharded", mesh_shape=mesh_shape, **kw)
    return Simulator(cfg).run(circuit)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh", [(1,), (2,), (4,), (8,)])
def test_ghz_parity_all_mesh_sizes(mesh):
    c = models.ghz(7)
    got = _run(c, mesh_shape=mesh)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_circuit_parity_8way(seed):
    c = models.random_circuit(8, 150, seed=seed)
    got = _run(c, mesh_shape=(8,))
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_grover_3_18_parity_4way():
    c = models.load_reference_circuit("grover_3_18")
    got = _run(c, mesh_shape=(4,), max_fused_qubits=4)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_gates_on_global_qubits_force_swaps():
    # every cx touches the top (global) qubits: planner must emit swaps
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    n, d = 6, 3
    c = Circuit(n)
    c.h(5).cx(5, 4).cx(4, 3)
    ops = circuit_to_ops(c)
    plan = plan_sharded(ops, n, d)
    assert plan.num_swaps > 0
    got = _run(c, mesh_shape=(8,), max_fused_qubits=3)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_plan_keeps_ops_local():
    c = models.random_circuit(8, 100, seed=3)
    ops = circuit_to_ops(c)
    plan = plan_sharded(ops, 8, 3)
    local_n = 5
    for item in plan.items:
        if isinstance(item, SwapItem):
            assert item.pos_a >= local_n and item.pos_b < local_n
        else:
            assert all(p < local_n for p in item.qubits)


def test_plan_rejects_too_wide_ops():
    c = models.ghz(4)
    from gpu_quantum_simulator_tpu.passes.fuse_k import fuse_k

    ops = fuse_k(c, max_qubits=4)  # one 4-wide block
    with pytest.raises(ValueError):
        plan_sharded(ops, 4, 1)  # only 3 local qubits


def test_permute_reduces_swaps():
    # hot qubits high: permutation should relabel them low and cut swaps
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    from gpu_quantum_simulator_tpu.passes.permute import plan_permutation

    n, d = 8, 3
    c = Circuit(n)
    for _ in range(20):
        c.cx(7, 6).h(7).h(6)
    base = plan_sharded(circuit_to_ops(c), n, d)
    perm = plan_permutation(c)
    relabeled = c.relabeled(perm)
    opt = plan_sharded(circuit_to_ops(relabeled), n, d)
    assert opt.num_swaps < base.num_swaps
    assert opt.num_swaps <= 2


# ------------------------------------------------- round-2 coverage (VERDICT)
def test_deep_circuit_many_swaps_n12():
    """2445 gates at n=12 over 4 devices: hundreds of planned ICI swaps plus
    two-level LocalSwapItem relocations, end-to-end parity."""
    c = models.grover_like(12, num_gates=2445, seed=0)
    got = _run(c, mesh_shape=(4,))
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_two_level_local_swaps_planned():
    """At local_n > 7 the planner must emit LocalSwapItems whenever an op
    would touch 3+ device-high positions."""
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline
    from gpu_quantum_simulator_tpu.passes.shard import LocalSwapItem

    c = models.grover_like(12, num_gates=2445, seed=0)
    ops = _fuse_pipeline(c, 7, max_high=2)
    plan = plan_sharded(ops, 12, 2, max_local_high=2)
    for item in plan.items:
        if hasattr(item, "kind") and item.kind == "u":
            assert sum(1 for p in item.qubits if p >= 7) <= 2
    assert plan.num_local_swaps > 0


def test_auto_mesh():
    """mesh_shape=None must build the largest power-of-two mesh."""
    c = models.random_circuit(9, 80, seed=3)
    got = _run(c, mesh_shape=None)
    want = REF.simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_non_power_of_two_devices():
    """A mesh built from 5 devices must truncate to 4 and stay correct."""
    import jax as _jax

    from gpu_quantum_simulator_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(None, ("amp",), devices=_jax.devices()[:5])
    assert mesh.shape["amp"] == 4


def test_restore_layout_roundtrip():
    """restore_layout plans end at the entry layout (needed for iteration)."""
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline

    c = models.grover_like(10, num_gates=400, seed=9)
    ops = _fuse_pipeline(c, 5, max_high=2)
    plan = plan_sharded(ops, 10, 3, max_local_high=2, restore_layout=True)
    np.testing.assert_array_equal(plan.final_position, np.arange(10))


def test_initial_state_resume_sharded():
    """Split a circuit in two; resume from the midpoint state (checkpoint
    parity through the sharded engine)."""
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    n = 10
    full = models.grover_like(n, num_gates=300, seed=17)
    first, second = Circuit(n), Circuit(n)
    first.gates = full.gates[:150]
    second.gates = full.gates[150:]
    sim = Simulator(SimulatorConfig(strategy="sharded", mesh_shape=(4,)))
    mid = sim.run(first)
    got = sim.run(second, initial=mid)
    want = REF.simulate_reference(full)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_run_device_iterated_sharded():
    """Grover-style prefix + body^k through the sharded engine."""
    from gpu_quantum_simulator_tpu.ops.apply import join_state

    n = 5
    prefix, body, _iters = models.grover_parts(n, marked=3)
    sim = Simulator(SimulatorConfig(strategy="sharded", mesh_shape=(4,)))
    reps = 3
    re, im, _ = sim.run_device_iterated(body, reps, prefix=prefix)
    got = join_state(np.asarray(re), np.asarray(im))

    merged = models.grover(n, marked=3, iterations=reps)
    want = REF.simulate_reference(merged)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_sharded_device_side_sampling_n23():
    """n > 22 routes through sample_state_device on the MESH-SHARDED state:
    the distribution/CDF reductions must compile over the virtual mesh
    (collectives auto-inserted), never gathering the 2^23 state."""
    import gpu_quantum_simulator_tpu as Q

    n = 23
    c = Q.models.grover_like(n, num_gates=30, seed=1)
    sim = Q.Simulator(Q.SimulatorConfig(strategy="sharded", mesh_shape=(8,)))
    s = sim.sample(c, 64, seed=0)
    assert s.shape == (64,)
    assert s.min() >= 0 and s.max() < (1 << n)


def test_sharded_observables_compose():
    """expectation_z / expectation_pauli_sum reduce sharded device states
    without a host gather (XLA inserts the collectives)."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum
    from gpu_quantum_simulator_tpu.sampling import expectation_z

    n = 10
    c = models.random_circuit(n, 120, seed=6)
    cfg = SimulatorConfig(strategy="sharded", mesh_shape=(8,))
    sim = Simulator(cfg)
    re, im, _ = sim.run_device(c)
    got = expectation_z(re, im, [0, 4, 9], n)

    ref = Simulator(SimulatorConfig(strategy="mxu"))
    re_f, im_f, _ = ref.run_device(c)
    want = expectation_z(re_f, im_f, [0, 4, 9], n)
    assert abs(got - want) < 1e-5

    terms = [(0.5, "Z0 Z4"), (-0.3, "X2"), (0.2, "Y7 Z1")]
    e_sharded = expectation_pauli_sum(c, terms, cfg)
    e_flat = expectation_pauli_sum(c, terms)
    assert abs(e_sharded - e_flat) < 1e-5


def test_quantum_volume_through_sharded_mesh():
    """The KAK-synthesized QV workload (dense SU(4) blocks on every pair)
    distributes correctly: 8-device mesh vs the f64 reference."""
    c = models.quantum_volume(7, depth=3, seed=5)
    got = _run(c, mesh_shape=(8,))
    want = REF.simulate_reference(c)
    assert np.max(np.abs(np.asarray(got) - want)) < TOL


# ------------------------------------------------- round-4 coverage (VERDICT)
def test_ici_bytes_accounting():
    """ShardPlan.ici_bytes counts num_swaps half-block exchanges: total
    = num_swaps * 2^(n-1) complex amplitudes * 8 B (split f32 re/im), and
    per-device * 2^d == total."""
    for n, d, gates, seed in [(10, 3, 200, 0), (12, 2, 500, 1), (9, 1, 300, 2)]:
        c = models.grover_like(n, num_gates=gates, seed=seed)
        plan = plan_sharded(circuit_to_ops(c), n, d)
        n_swap_items = sum(1 for it in plan.items if isinstance(it, SwapItem))
        assert n_swap_items == plan.num_swaps
        assert plan.ici_bytes() == plan.num_swaps * (1 << (n - 1)) * 8
        assert plan.ici_bytes_per_device() * (1 << d) == plan.ici_bytes()
        # f64 doubles it
        assert plan.ici_bytes(real_bytes=8) == 2 * plan.ici_bytes()


def test_ici_half_block_is_analytic_minimum():
    """Ground-truth the half-block claim (parallel/sharded.py docstring):
    swapping global bit p with local bit l relocates amplitude i across
    devices iff bit_p(i) != bit_l(i) — EXACTLY half of all 2^n basis
    indices.  ici_bytes charges each swap exactly that many amplitudes,
    so the accounting equals the analytic minimum data motion."""
    n, d = 9, 3
    local_n = n - d
    idx = np.arange(1 << n)
    for p in range(local_n, n):
        for l in range(local_n):
            bit_p = (idx >> p) & 1
            bit_l = (idx >> l) & 1
            # new index after exchanging bit positions p and l
            swapped = idx & ~((1 << p) | (1 << l)) | (bit_l << p) | (bit_p << l)
            moved = int(np.sum((swapped >> local_n) != (idx >> local_n)))
            assert moved == 1 << (n - 1)
    plan = plan_sharded(circuit_to_ops(models.ghz(n).cx(8, 0)), n, d)
    assert plan.num_swaps >= 1
    per_swap_amps = plan.ici_bytes() // (plan.num_swaps * 8)
    assert per_swap_amps == 1 << (n - 1)


def test_victim_policy_ab_grover_profile():
    """Planner A/B (VERDICT r3 #4): the remaining-use ("cold") victim
    choice must beat the naive first-free-slot baseline on gswap count
    for grover-profile circuits — the corrected version of the
    reference's usage histogram (quantum_simulator_preproces_permute.cu:
    388-413, defect #5) actually pays off."""
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline

    for n, d, gates, seed in [(12, 2, 2445, 0), (12, 3, 2445, 0),
                              (16, 3, 2445, 318)]:
        c = models.grover_like(n, num_gates=gates, seed=seed)
        ops = _fuse_pipeline(c, min(7, n - d), max_high=2)
        cold = plan_sharded(ops, n, d, max_local_high=2)
        first = plan_sharded(ops, n, d, max_local_high=2,
                             victim_policy="first")
        assert cold.num_swaps < first.num_swaps
        assert cold.ici_bytes() < first.ici_bytes()
    with pytest.raises(ValueError):
        plan_sharded([], 8, 2, victim_policy="hottest")

def test_victim_policy_ab_modeled_seconds():
    """The ICI-aware cost model (engine/plancost.estimate_shard_plan) must
    rank the measured-better plan first: "cold" beats "first" on MODELED
    SECONDS, not just swap counts — the model consumes ici_bytes_per_device
    (ICI term) plus per-item HBM passes, so fewer half-block exchanges on
    the same op stream must yield a strictly smaller estimate."""
    from gpu_quantum_simulator_tpu.engine.plancost import estimate_shard_plan
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline

    for n, d, gates, seed in [(12, 2, 2445, 0), (16, 3, 2445, 318)]:
        c = models.grover_like(n, num_gates=gates, seed=seed)
        ops = _fuse_pipeline(c, min(7, n - d), max_high=2)
        cold = plan_sharded(ops, n, d, max_local_high=2)
        first = plan_sharded(ops, n, d, max_local_high=2,
                             victim_policy="first")
        s_cold, acc_cold = estimate_shard_plan(cold, n)
        s_first, _ = estimate_shard_plan(first, n)
        assert s_cold < s_first
        # the ICI term is exactly ici_bytes_per_device / ICI bandwidth
        # plus the per-exchange latency
        from gpu_quantum_simulator_tpu.engine import plancost as PC
        want_ici = (cold.ici_bytes_per_device() / (PC.ICI_GBS * 1e9)
                    + cold.num_swaps * PC.GSWAP_LAT_US * PC.US)
        assert abs(acc_cold["gswap_ici"] - want_ici) < 1e-12


def test_choose_num_global_models_tradeoff():
    """choose_num_global picks the mesh split by modeled seconds.  A
    local-heavy circuit (every gate on low qubits) must prefer the widest
    split (halving every pass, no extra swaps); a global-thrashing circuit
    alternating across the top qubits must NOT pick the widest split —
    the gswap term the reference could never express (it had one GPU)
    outweighs the local saving."""
    from gpu_quantum_simulator_tpu.engine.plancost import choose_num_global
    from gpu_quantum_simulator_tpu.ir.oplist import Op

    n = 12
    h = np.sqrt(0.5) * np.array([[1, 1], [1, -1]], dtype=np.complex64)
    local_ops = [Op("u", (q % 4,), h) for q in range(64)]
    best_local, scores_local = choose_num_global(local_ops, n, 8)
    assert best_local == 3, scores_local
    assert set(scores_local) == {1, 2, 3}

    # alternate single-qubit gates across ALL of the top qubits: at d=3
    # every gate forces a fresh half-block exchange
    churn = [Op("u", (n - 1 - (k % 5),), h) for k in range(64)]
    best_churn, scores_churn = choose_num_global(churn, n, 8)
    assert scores_churn[best_churn] <= min(scores_churn.values())
    assert best_churn < 3, scores_churn

    # segmented variant runs the prefetch planner at num_global=d
    deep = models.grover_like(16, num_gates=600, seed=7)
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline
    ops16 = _fuse_pipeline(deep, 7, max_high=2)
    best_seg, scores_seg = choose_num_global(ops16, 16, 8, segmented=True)
    assert best_seg in scores_seg and len(scores_seg) >= 2
