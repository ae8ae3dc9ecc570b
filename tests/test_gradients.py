"""Parameter-shift gradients vs central finite differences (f64 reference)."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import gradients as GR
from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.ir.circuit import Circuit, Gate


def _vqe_circuit(n=4, seed=0):
    rng = np.random.default_rng(seed)
    c = Circuit(n)
    for q in range(n):
        c.append("h", q)
    for layer in range(2):
        for q in range(n):
            c.append("rz", q, params=(float(rng.uniform(-np.pi, np.pi)),))
            c.append("ry", q, params=(float(rng.uniform(-np.pi, np.pi)),))
        for q in range(n - 1):
            c.append("cx", q, q + 1)
    return c


def _fd_grad(circuit, z_qubits, idxs, eps=1e-5):
    cfg = SimulatorConfig(strategy="reference")
    out = []
    for i in idxs:
        ep = GR.expectation(GR._shifted(circuit, i, eps), z_qubits, cfg)
        em = GR.expectation(GR._shifted(circuit, i, -eps), z_qubits, cfg)
        out.append((ep - em) / (2 * eps))
    return np.asarray(out)


def test_parameter_shift_matches_finite_differences():
    c = _vqe_circuit()
    idxs = GR.parameterized_gates(c)[:6]  # keep runtime bounded
    cfg = SimulatorConfig(strategy="reference")
    got, got_idx = GR.parameter_shift(c, [0, 1], cfg, gate_indices=idxs)
    want = _fd_grad(c, [0, 1], idxs)
    assert got_idx == idxs
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_parameter_shift_through_f32_engine():
    """The shift rule through a float32 engine stays within f32 noise."""
    c = _vqe_circuit(n=5, seed=3)
    idxs = GR.parameterized_gates(c)[:4]
    got, _ = GR.parameter_shift(c, [0, 2], SimulatorConfig(strategy="mxu"),
                                gate_indices=idxs)
    want = _fd_grad(c, [0, 2], idxs)
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_parameterized_gate_discovery():
    c = Circuit(2)
    c.append("h", 0)
    c.append("rz", 0, params=(0.3,))
    c.append("cx", 0, 1)
    c.append("rx", 1, params=(0.7,))
    assert GR.parameterized_gates(c) == [1, 3]


def test_nonrotation_gates_excluded():
    c = Circuit(1)
    c.append("h", 0)
    c.append("t", 0)
    assert GR.parameterized_gates(c) == []
    grads, idxs = GR.parameter_shift(c, [0], SimulatorConfig(strategy="reference"))
    assert len(grads) == 0 and idxs == []


def test_parameter_shift_noisy_zero_noise_matches_pure():
    from gpu_quantum_simulator_tpu.gradients import (
        parameter_shift, parameter_shift_noisy)

    c = Circuit(2)
    c.rz(0.4, 0)
    c.sx(0)
    c.rz(1.1, 0)
    c.cx(0, 1)
    pure, idxs = parameter_shift(c, [0, 1])
    noisy, idxs2 = parameter_shift_noisy(c, [(1.0, "Z0 Z1")], shots=8, seed=0)
    assert idxs == idxs2
    np.testing.assert_allclose(noisy, pure, atol=1e-5)


def test_parameter_shift_noisy_depolarizing_shrinks_gradient():
    # a depolarizing channel after the rotation contracts <Z> by (1-p),
    # so every gradient component shrinks by the same factor
    from gpu_quantum_simulator_tpu.gradients import parameter_shift_noisy

    c = Circuit(1)
    c.rz(0.7, 0)
    c.sx(0)
    c.rz(0.3, 0)
    p = 0.4
    g0, _ = parameter_shift_noisy(c, [(1.0, "Z0")], shots=4096, p1=0.0, seed=1)
    g1, _ = parameter_shift_noisy(c, [(1.0, "Z0")], shots=4096, p1=p, seed=1)
    scale = (1 - p) ** 3             # three 1q gates, channel after each
    np.testing.assert_allclose(g1, g0 * scale, atol=0.05)


def test_adjoint_matches_parameter_shift_z_string():
    from gpu_quantum_simulator_tpu.gradients import (
        adjoint_gradient, parameter_shift)

    c = models.random_circuit(5, 40, seed=11)
    g_shift, idxs_s = parameter_shift(c, z_qubits=[0, 2])
    g_adj, idxs_a = adjoint_gradient(c, z_qubits=[0, 2])
    assert idxs_a == idxs_s
    assert len(idxs_a) > 0
    assert np.max(np.abs(g_adj - g_shift)) < 2e-5


def test_adjoint_matches_parameter_shift_pauli_sum():
    import gpu_quantum_simulator_tpu as Q
    from gpu_quantum_simulator_tpu.gradients import adjoint_gradient
    from gpu_quantum_simulator_tpu.gradients import parameter_shift

    terms = [(0.7, "Z0 Z1"), (-0.3, "X0"), (0.2, "Y2 Z0"), (0.5, "IIII")]
    c = models.random_circuit(4, 30, seed=13)
    fn = lambda cc: Q.expectation_pauli_sum(cc, terms)
    g_shift, idxs_s = parameter_shift(c, expectation_fn=fn)
    g_adj, idxs_a = adjoint_gradient(c, terms=terms)
    assert idxs_a == idxs_s
    assert np.max(np.abs(g_adj - g_shift)) < 2e-5


def test_adjoint_all_rotation_kinds():
    """rx/ry/rz/p each get the right adjoint rule."""
    from gpu_quantum_simulator_tpu.gradients import (
        adjoint_gradient, parameter_shift)
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(2)
    c.h(0)
    c.rx(0.3, 0)
    c.ry(-0.8, 1)
    c.cx(0, 1)
    c.rz(0.5, 1)
    c.p(1.1, 0)
    g_shift, _ = parameter_shift(c, z_qubits=[0, 1])
    g_adj, idxs = adjoint_gradient(c, z_qubits=[0, 1])
    assert len(idxs) == 4
    assert np.max(np.abs(g_adj - g_shift)) < 2e-6


def test_adjoint_rejects_unsupported_gate_index():
    import pytest
    from gpu_quantum_simulator_tpu.gradients import adjoint_gradient
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit

    c = Circuit(1)
    c.h(0)
    with pytest.raises(ValueError):
        adjoint_gradient(c, z_qubits=[0], gate_indices=[0])


def test_value_and_grad_matches_adjoint_and_iterates():
    """make_adjoint_value_and_grad: same grads as adjoint_gradient, traced
    params (no recompilation across theta values), and a short VQE descent
    on a 4-qubit TFIM actually lowers the energy."""
    from gpu_quantum_simulator_tpu.gradients import (
        adjoint_gradient, make_adjoint_value_and_grad)

    n = 4
    terms = [(-1.0, f"Z{i} Z{(i + 1) % n}") for i in range(n - 1)]
    terms += [(-0.7, f"X{i}") for i in range(n)]

    # hardware-efficient ansatz: ry layer, cx chain, ry layer
    c = Circuit(n)
    rng = np.random.default_rng(5)
    for q in range(n):
        c.ry(rng.uniform(-0.4, 0.4), q)
    for q in range(n - 1):
        c.cx(q, q + 1)
    for q in range(n):
        c.ry(rng.uniform(-0.4, 0.4), q)
    # include a fixed parameterized gate to hit the constant path
    c.u(0.3, 0.1, -0.2, 0)

    fn, idxs, theta0 = make_adjoint_value_and_grad(c, terms)
    e0, g0 = fn(theta0)
    g_ref, idxs_ref = adjoint_gradient(c, terms=terms)
    assert idxs == idxs_ref
    assert np.max(np.abs(np.asarray(g0) - g_ref)) < 2e-5

    import optax

    opt = optax.adam(0.1)
    theta = np.asarray(theta0)
    state = opt.init(theta)
    energies = [float(e0)]
    for _ in range(25):
        e, g = fn(theta)
        upd, state = opt.update(np.asarray(g), state)
        theta = np.asarray(optax.apply_updates(theta, upd))
        energies.append(float(e))
    assert energies[-1] < energies[0] - 0.5, energies[::5]


def test_tied_qaoa_gradients_match_finite_differences():
    """qaoa_maxcut_tied + tie: slot-indexed (gamma, beta) gradients obey
    the chain rule — checked against central finite differences of the
    SAME compiled energy, and the energy against expectation_pauli_sum."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.gradients import make_adjoint_value_and_grad
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    n, gammas, betas = 6, (0.55, -0.3), (0.25, 0.8)
    c, tie, terms = models.qaoa_maxcut_tied(n, gammas=gammas, betas=betas)
    fn, idxs, theta0 = make_adjoint_value_and_grad(c, terms, tie=tie)
    assert list(theta0) == [0.55, -0.3, 0.25, 0.8]
    assert len(idxs) == len(tie) == 2 * (n + n)  # p=2 layers: n edges + n mixers

    e0, g0 = fn(theta0)
    e_ref = expectation_pauli_sum(c, terms)
    assert abs(float(e0) - e_ref) < 1e-5

    eps = 1e-3
    for s in range(4):
        tp, tm = np.array(theta0), np.array(theta0)
        tp[s] += eps
        tm[s] -= eps
        ep, _ = fn(tp)
        em, _ = fn(tm)
        fd = (float(ep) - float(em)) / (2 * eps)
        assert abs(float(g0[s]) - fd) < 2e-3, (s, float(g0[s]), fd)


def test_tied_qaoa_descent_improves_cut():
    """Gradient ASCENT on <C> (MaxCut) with tied angles beats the start."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.gradients import make_adjoint_value_and_grad

    n = 8
    c, tie, terms = models.qaoa_maxcut_tied(n, gammas=(0.2,), betas=(0.2,))
    fn, _, theta = make_adjoint_value_and_grad(c, terms, tie=tie)
    theta = np.asarray(theta)
    e_first = None
    for _ in range(80):
        e, g = fn(theta)
        if e_first is None:
            e_first = float(e)
        theta = theta + 0.05 * np.asarray(g)
    e_last = float(fn(theta)[0])
    assert e_last > e_first + 0.5
    # p=1 ring QAOA optimum: gamma=pi/4, beta=pi/8, <C> = 3n/4
    assert abs(e_last - 0.75 * n) < 1e-3
    assert abs(abs(theta[0]) - np.pi / 4) < 1e-3
    assert abs(abs(theta[1]) - np.pi / 8) < 1e-3


def test_tie_validation_errors():
    from gpu_quantum_simulator_tpu.gradients import make_adjoint_value_and_grad

    c = Circuit(2)
    c.h(0)
    c.rz(0.3, 1)
    with pytest.raises(ValueError):  # h has no adjoint rule
        make_adjoint_value_and_grad(c, [(1.0, "Z0")], tie={0: (0, 1.0)})
    with pytest.raises(ValueError):  # zero scale
        make_adjoint_value_and_grad(c, [(1.0, "Z0")], tie={1: (0, 0.0)})
    with pytest.raises(ValueError):  # non-contiguous slots
        make_adjoint_value_and_grad(c, [(1.0, "Z0")], tie={1: (2, 1.0)})


def test_run_vqe_device_resident_loop():
    """run_vqe: the whole optimization is one scanned device program; it
    reproduces the host-loop trajectory and converges on TFIM / QAOA."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.gradients import (
        make_adjoint_value_and_grad, run_vqe)

    # VQE descent on a 4-qubit TFIM
    n = 4
    terms = [(-1.0, f"Z{i} Z{i + 1}") for i in range(n - 1)]
    terms += [(-0.7, f"X{i}") for i in range(n)]
    c = Circuit(n)
    rng = np.random.default_rng(3)
    for q in range(n):
        c.ry(rng.uniform(-0.4, 0.4), q)
    for q in range(n - 1):
        c.cx(q, q + 1)
    for q in range(n):
        c.ry(rng.uniform(-0.4, 0.4), q)

    theta, energies = run_vqe(c, terms, steps=30, learning_rate=0.1)
    assert energies.shape == (30,)
    assert energies[-1] < energies[0] - 0.3

    # trajectory parity vs an explicit host loop with the same optimizer
    import optax

    fn, _, th0 = make_adjoint_value_and_grad(c, terms)
    opt = optax.adam(0.1)
    th = np.asarray(th0)
    state = opt.init(th)
    host_es = []
    for _ in range(30):
        e, g = fn(th)
        host_es.append(float(e))
        upd, state = opt.update(np.asarray(g), state, th)
        th = np.asarray(optax.apply_updates(th, upd))
    assert np.max(np.abs(energies - np.array(host_es))) < 1e-4
    assert np.max(np.abs(theta - th)) < 1e-4

    # QAOA ascent with tied angles reaches the p=1 ring optimum
    c2, tie, terms2 = models.qaoa_maxcut_tied(6, gammas=(0.2,), betas=(0.2,))
    th2, es2 = run_vqe(c2, terms2, steps=120, learning_rate=0.05,
                       tie=tie, maximize=True)
    assert es2[-1] > es2[0]
    e_final = 0.75 * 6
    assert abs(float(es2[-1]) - e_final) < 0.05 or \
        abs(abs(th2[0]) - np.pi / 4) < 0.05


def test_run_vqe_restarts_escape_local_minimum():
    """restarts=K vmaps the whole optimization over K initial points; the
    kept run is at least as good as the single-start run (here the p=1
    QAOA landscape from a deliberately bad start)."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.gradients import run_vqe

    # bad start: near-zero angles (a saddle; gradients tiny)
    c, tie, terms = models.qaoa_maxcut_tied(6, gammas=(1e-3,), betas=(1e-3,))
    _, es_single = run_vqe(c, terms, steps=60, learning_rate=0.05,
                           tie=tie, maximize=True)
    theta_b, es_best = run_vqe(c, terms, steps=60, learning_rate=0.05,
                               tie=tie, maximize=True, restarts=6, seed=1)
    assert es_best[-1] >= es_single[-1] - 1e-6
    # the restart pool should actually solve it (optimum = 4.5 at n=6)
    assert es_best[-1] > 4.0


def test_energy_landscape_grid():
    """Vmapped grid evaluation agrees pointwise with the scalar fn and
    locates the p=1 QAOA optimum on a coarse (gamma, beta) heatmap."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.gradients import (
        energy_landscape, make_adjoint_value_and_grad)

    c, tie, terms = models.qaoa_maxcut_tied(6, gammas=(0.3,), betas=(0.3,))
    fn, _, _ = make_adjoint_value_and_grad(c, terms, tie=tie)

    gs = np.linspace(0.1, 1.2, 7)
    bs = np.linspace(0.1, 0.7, 5)
    g, b = np.meshgrid(gs, bs, indexing="ij")
    grid = np.stack([g, b], -1).reshape(-1, 2)
    E = energy_landscape(c, terms, grid, tie=tie, max_batch_log2=9)
    for k in (0, 10, 34):
        want, _ = fn(grid[k])
        assert abs(E[k] - float(want)) < 1e-5
    # the coarse-grid argmax sits near (pi/4, pi/8)
    gi, bi = np.unravel_index(np.argmax(E.reshape(g.shape)), g.shape)
    assert abs(gs[gi] - np.pi / 4) < 0.2
    assert abs(bs[bi] - np.pi / 8) < 0.16

    import pytest
    with pytest.raises(ValueError):
        energy_landscape(c, terms, np.zeros(3), tie=tie)
