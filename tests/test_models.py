import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models, simulate
from gpu_quantum_simulator_tpu.ir.circuit import Circuit
from gpu_quantum_simulator_tpu.models.circuits import _ccx, _controlled_z_all
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference


@pytest.mark.parametrize("inp", range(8))
def test_ccx_truth_table(inp):
    c = Circuit(3)
    for b in range(3):
        if (inp >> b) & 1:
            c.x(b)
    _ccx(c, 0, 1, 2)
    v = simulate_reference(c)
    expect = inp ^ (4 if (inp & 3) == 3 else 0)
    assert int(np.argmax(np.abs(v))) == expect
    assert abs(abs(v[expect]) - 1) < 1e-9  # no stray relative phase on basis states


def test_controlled_z_all_phases():
    # C^3 Z over 4 data qubits (2 ancillas): -1 phase iff data == 1111,
    # ancillas returned to |0>
    for inp in [0b0000, 0b0111, 0b1111]:
        c = Circuit(6)
        for b in range(4):
            if (inp >> b) & 1:
                c.x(b)
        _controlled_z_all(c, [0, 1, 2, 3], [4, 5])
        v = simulate_reference(c)
        idx = int(np.argmax(np.abs(v)))
        assert idx == inp  # ancillas clean
        want = -1.0 if inp == 0b1111 else 1.0
        assert v[idx] == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("marked", [0, 13, 31])
def test_grover_finds_marked(marked):
    c = models.grover(5, marked=marked)
    v = simulate_reference(c)
    p = np.abs(v) ** 2
    assert int(np.argmax(p)) == marked
    assert p[marked] > 0.99


def test_grover_on_engine():
    c = models.grover(4, marked=9)
    got = simulate(c, strategy="mxu")
    want = simulate_reference(c)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_grover_like_profile():
    c = models.grover_like(8, num_gates=500, seed=1)
    counts = c.gate_counts()
    assert set(counts) <= {"cx", "rz", "sx", "x"}
    assert len(c) == 500


def test_ghz_and_qft_sizes():
    assert len(models.ghz(7)) == 7
    assert models.qft(5).num_qubits == 5


def test_circuit_inverse_exact():
    """c.inverse() is the exact unitary inverse (global phase included):
    running c then c.inverse() restores |0...0> across the full gate set."""
    c = Circuit(4)
    c.h(0).sx(1).t(2).s(3).x(0).y(1).z(2).sdg(3).tdg(0).sxdg(1)
    c.rz(0.3, 0).rx(-0.7, 1).ry(1.1, 2).p(0.9, 3)
    c.u(0.4, 0.2, -0.5, 0)
    c.cx(0, 2).cx(3, 1)
    both = Circuit(4, list(c.gates))
    both.gates.extend(c.inverse().gates)
    v = simulate_reference(both)
    want = np.zeros(16, dtype=complex)
    want[0] = 1.0
    assert np.max(np.abs(v - want)) < 1e-12


def test_circuit_compose_mapping_and_errors():
    import pytest

    inner = Circuit(2)
    inner.h(0).cx(0, 1)
    outer = Circuit(4)
    outer.compose(inner, qubits=[3, 1])
    assert [(g.name, g.qubits) for g in outer.gates] == [
        ("h", (3,)), ("cx", (3, 1))]
    with pytest.raises(ValueError):
        Circuit(4).compose(inner, qubits=[0])        # wrong arity
    with pytest.raises(ValueError):
        Circuit(4).compose(inner, qubits=[0, 4])     # out of range
    with pytest.raises(ValueError):
        Circuit(4).compose(inner, qubits=[2, 2])     # duplicate


def test_circuit_self_compose_doubles():
    # regression: c.compose(c) must snapshot the gate list — iterating
    # the live list while appending never terminated (unbounded memory)
    c = Circuit(2).h(0).cx(0, 1).rz(0.5, 1)
    c.compose(c)
    assert len(c.gates) == 6
    assert [g.name for g in c.gates] == ["h", "cx", "rz"] * 2


def test_simon_orthogonal_samples_and_recovery():
    """Simon's circuit: the query register is uniform over the hyperplane
    orthogonal to the secret, and GF(2) elimination recovers it."""
    n, s = 5, 0b10110
    c = models.simon(s, n)
    p = np.abs(simulate_reference(c)) ** 2
    py = p.reshape(1 << n, 1 << n).sum(axis=0)   # query = low n bits
    support = np.nonzero(py > 1e-12)[0]
    assert all(bin(int(y) & s).count("1") % 2 == 0 for y in support)
    assert len(support) == 1 << (n - 1)
    assert np.allclose(py[support], 1.0 / (1 << (n - 1)), atol=1e-9)
    assert models.simon_secret_from_samples(support.tolist(), n) == s
    # regression: recovery must be sample-order independent (rows were
    # inserted with stale lower-pivot bits, breaking the RREF invariant)
    import random
    ys = support.tolist()
    for seed in range(3):
        random.Random(seed).shuffle(ys)
        assert models.simon_secret_from_samples(ys, n) == s
    assert models.simon_secret_from_samples([0, int(support[1])], n) is None

    # s = 0: f is a bijection, samples span the full space -> returns 0
    p0 = np.abs(simulate_reference(models.simon(0, 3))) ** 2
    y0 = np.nonzero(p0.reshape(8, 8).sum(axis=0) > 1e-12)[0]
    assert len(y0) == 8
    assert models.simon_secret_from_samples(y0.tolist(), 3) == 0

    with pytest.raises(ValueError):
        models.simon(1 << 5, 5)


def test_shor_order_finding_peaks_and_factors():
    """Compiled Shor-15: the eval register peaks EXACTLY at the four
    multiples of 2^t/4 for a=7 (order 4), and the classical
    post-processing recovers 15 = 3 x 5 from every non-zero peak."""
    t = 6
    c = models.shor_order_finding(7, num_eval_qubits=t)
    psi = simulate_reference(c)
    p = np.abs(psi) ** 2
    p_eval = p.reshape(16, 1 << t).sum(axis=0)   # eval = low t bits
    peaks = [0, 16, 32, 48]
    assert p_eval[peaks].sum() > 1 - 1e-9
    for s in peaks:
        assert abs(p_eval[s] - 0.25) < 1e-9
    results = {models.shor_factors_from_index(i, t, 7) for i in peaks[1:]}
    assert results == {(3, 5)}
    assert models.shor_factors_from_index(0, t, 7) is None

    # order-2 multiplier (a=4): peaks at {0, 2^t/2}; still factors
    t2 = 4
    c2 = models.shor_order_finding(4, num_eval_qubits=t2)
    p2 = np.abs(simulate_reference(c2)) ** 2
    pe2 = p2.reshape(16, 1 << t2).sum(axis=0)
    assert pe2[0] + pe2[8] > 1 - 1e-9
    assert models.shor_factors_from_index(8, t2, 4) == (3, 5)

    with pytest.raises(ValueError):
        models.shor_order_finding(3)    # not a unit mod 15
    with pytest.raises(ValueError):
        models.shor_order_finding(7, num_eval_qubits=1)


def test_phase_estimation_exact_and_concentrated():
    """QPE peaks EXACTLY (p=1) at the dyadic eigenphase index and
    concentrates >40% on the two neighbors for a non-dyadic phase."""
    import math

    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator

    sim = Simulator(SimulatorConfig(strategy="mxu"))
    m = 4
    for a in (0, 3, 11, 15):
        c = models.phase_estimation(m, 2 * math.pi * a / (1 << m))
        p = np.abs(sim.run(c)) ** 2
        peak = int(np.argmax(p))
        assert peak & ((1 << m) - 1) == a
        assert peak >> m == 1                 # eigenstate qubit stayed |1>
        assert p[peak] > 1 - 1e-6

    theta = 2 * math.pi * 0.3        # between 4/16 and 5/16
    p = np.abs(sim.run(models.phase_estimation(m, theta))) ** 2
    mass = p[(1 << m) | 4] + p[(1 << m) | 5]
    assert mass > 0.8


def test_circuit_unitary_matches_reference_columns():
    import pytest

    from gpu_quantum_simulator_tpu import circuit_unitary
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    c = models.random_circuit(4, 40, seed=17)
    U = circuit_unitary(c)
    # unitary
    assert np.max(np.abs(U.conj().T @ U - np.eye(16))) < 1e-12
    # column j = action on basis state |j>
    for j in (0, 5, 15):
        e = np.zeros(16, dtype=complex)
        e[j] = 1.0
        assert np.max(np.abs(U[:, j] - simulate_reference(c, initial=e))) < 1e-12
    # c.inverse() really is the matrix inverse
    V = circuit_unitary(c.inverse())
    assert np.max(np.abs(V @ U - np.eye(16))) < 1e-12
    with pytest.raises(ValueError):
        circuit_unitary(Circuit(13))


def test_hamiltonian_term_builders():
    """tfim_terms matches the trotter evolution convention (energy is
    conserved under its own Trotter circuit as dt -> 0) and
    heisenberg_terms matches dense algebra on 3 sites."""
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    n = 5
    terms = models.tfim_terms(n, J=1.0, g=0.8)
    assert len(terms) == (n - 1) + n
    # |0...0>: <ZZ> = 1 per bond, <X> = 0 -> E = -J (n-1)
    e0 = expectation_pauli_sum(models.trotter_tfim(n, 1e-9, steps=1), terms)
    assert abs(e0 - (-(n - 1))) < 1e-4
    # energy conservation under small-dt Trotter evolution
    e1 = expectation_pauli_sum(models.trotter_tfim(n, 0.01, g=0.8, steps=50),
                               terms)
    assert abs(e1 - e0) < 0.02

    # Heisenberg on 3 sites vs dense kron algebra
    import numpy as np
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1.0, -1.0]).astype(complex)
    I = np.eye(2)
    def k3(a, b, c):       # qubit 0 = LAST kron factor
        return np.kron(np.kron(c, b), a)
    H = (1.0 * (k3(X, X, I) + k3(I, X, X))
         + 0.5 * (k3(Y, Y, I) + k3(I, Y, Y))
         + 2.0 * (k3(Z, Z, I) + k3(I, Z, Z))
         + 0.3 * (k3(Z, I, I) + k3(I, Z, I) + k3(I, I, Z)))
    terms3 = models.heisenberg_terms(3, Jx=1.0, Jy=0.5, Jz=2.0, h=0.3)
    c = models.random_circuit(3, 40, seed=6)
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference
    psi = simulate_reference(c)
    want = float(np.real(np.vdot(psi, H @ psi)))
    got = expectation_pauli_sum(c, terms3)
    assert abs(got - want) < 1e-5


def test_trotter_order2_beats_order1():
    """Symmetric Trotter: global error O(dt^2) vs O(dt) — fidelity to the
    exact evolution (dense eigendecomposition) is strictly better, and the
    order-2 error shrinks ~4x when dt halves."""
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    n, T = 5, 1.0
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Z = np.diag([1.0, -1.0]).astype(complex)
    I = np.eye(2)

    def op(mat, q):
        m = np.array([[1.0]])
        for k in range(n):
            m = np.kron(mat if k == q else I, m)
        return m

    H = sum(-1.0 * op(Z, i) @ op(Z, i + 1) for i in range(n - 1))
    H = H + sum(-1.0 * op(X, i) for i in range(n))
    w, v = np.linalg.eigh(H)
    psi0 = np.zeros(1 << n, dtype=complex)
    psi0[0] = 1.0
    exact = v @ (np.exp(-1j * w * T) * (v.conj().T @ psi0))

    def err(order, steps):
        c = models.trotter_tfim(n, T / steps, steps=steps, order=order)
        psi = simulate_reference(c)
        f = abs(np.vdot(exact, psi))
        return 1.0 - f

    e1 = err(1, 20)
    e2 = err(2, 20)
    e2h = err(2, 40)
    assert e2 < e1 / 3
    assert e2h < e2 / 3         # ~dt^2 scaling (4x expected)

    import pytest
    with pytest.raises(ValueError):
        models.trotter_tfim_parts(4, 0.1, order=3)


def test_trotter_heisenberg_matches_exact_evolution():
    """Heisenberg Trotter vs exact eigendecomposition evolution: high
    fidelity at small dt, and energy conservation under its own terms."""
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    n, T = 4, 0.8
    Jx, Jy, Jz, hf = 0.9, 0.7, 1.1, 0.4
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1.0, -1.0]).astype(complex)
    I = np.eye(2)

    def op2(m1, q1, m2, q2):
        m = np.array([[1.0]])
        for k in range(n):
            f = m1 if k == q1 else (m2 if k == q2 else I)
            m = np.kron(f, m)
        return m

    H = sum(Jx * op2(X, i, X, i + 1) + Jy * op2(Y, i, Y, i + 1)
            + Jz * op2(Z, i, Z, i + 1) for i in range(n - 1))
    H = H + hf * sum(op2(Z, i, I, (i + 1) % n) for i in range(n))
    w, v = np.linalg.eigh(H)
    psi0 = np.zeros(1 << n, dtype=complex)
    psi0[0] = 1.0
    exact = v @ (np.exp(-1j * w * T) * (v.conj().T @ psi0))

    steps = 60
    c = models.trotter_heisenberg(n, T / steps, Jx, Jy, Jz, hf, steps=steps)
    psi = simulate_reference(c)
    fid = abs(np.vdot(exact, psi))
    assert fid > 0.999, fid

    terms = models.heisenberg_terms(n, Jx, Jy, Jz, hf)
    e0 = float(np.real(np.vdot(psi0, H @ psi0)))
    e1 = expectation_pauli_sum(c, terms)
    assert abs(e1 - e0) < 0.03


def test_bernstein_vazirani_and_deutsch_jozsa():
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import marginal_probabilities

    import jax.numpy as jnp
    import pytest

    sim = Simulator(SimulatorConfig(strategy="mxu"))
    n = 6
    for secret in (0b101101, 0, 0b111111):
        c = models.bernstein_vazirani(secret, n)
        p = np.abs(sim.run(c)) ** 2
        # query register (low n bits) = secret with certainty
        reg = p.reshape(2, 1 << n).sum(axis=0)
        assert reg[secret] > 1 - 1e-6

    for balanced, mask in ((True, 0b0110), (False, 1)):
        c = models.deutsch_jozsa(4, balanced=balanced, mask=mask)
        p = np.abs(sim.run(c)) ** 2
        p0 = p.reshape(2, 16).sum(axis=0)[0]   # P(query register == 0)
        assert (p0 < 1e-6) if balanced else (p0 > 1 - 1e-6)

    with pytest.raises(ValueError):
        models.bernstein_vazirani(1 << 6, 6)
    with pytest.raises(ValueError):
        models.deutsch_jozsa(4, balanced=True, mask=0)


def test_w_state_amplitudes():
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    for n in (1, 2, 3, 6, 9):
        v = simulate_reference(models.w_state(n))
        want = np.zeros(1 << n, dtype=complex)
        for q in range(n):
            want[1 << q] = 1.0 / np.sqrt(n)
        assert np.max(np.abs(v - want)) < 1e-12, n

    import pytest
    with pytest.raises(ValueError):
        models.w_state(0)


class TestPauliRotEvolution:
    """Circuit.pauli_rot = exact exp(-i theta/2 P); models.pauli_evolution
    Trotterizes any (coeff, pauli) Hamiltonian with the textbook rates."""

    def test_pauli_rot_exact(self):
        import numpy as np
        from scipy.linalg import expm

        from gpu_quantum_simulator_tpu import circuit_unitary
        from gpu_quantum_simulator_tpu.ir.circuit import Circuit

        P = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
             "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}

        def pauli_mat(s):
            m = np.eye(1)
            for ch in s:                    # qubit 0 leftmost = bit 0
                m = np.kron(P[ch], m)
            return m

        for s, th in [("Z", 0.7), ("Y", -1.1), ("XZ", 2.2), ("IXI", 0.4),
                      ("XYZ", -0.9), ("III", 1.3), ("YXZY", 0.25)]:
            want = expm(-0.5j * th * pauli_mat(s))
            c = Circuit(len(s))
            c.pauli_rot(th, s)
            got = np.asarray(circuit_unitary(c))
            assert np.max(np.abs(got - want)) < 1e-9, s
        # sparse spec == dense spec
        a = Circuit(5).pauli_rot(0.7, "X0 Z3")
        b = Circuit(5).pauli_rot(0.7, "XIIZI")
        assert np.max(np.abs(np.asarray(circuit_unitary(a))
                             - np.asarray(circuit_unitary(b)))) < 1e-12

    def test_pauli_evolution_rates(self):
        import numpy as np
        from scipy.linalg import expm

        from gpu_quantum_simulator_tpu import circuit_unitary, models
        from gpu_quantum_simulator_tpu.observables import _parse_pauli

        P = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
             "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}
        n, t = 3, 0.6
        terms = models.tfim_terms(n, J=1.0, g=0.7)
        H = np.zeros((1 << n, 1 << n), dtype=complex)
        for coef, s in terms:
            ops = _parse_pauli(s, n)
            m = np.eye(1)
            for q in reversed(range(n)):
                m = np.kron(m, P[ops.get(q, "I")])
            H += coef * m
        want = expm(-1j * t * H)

        def err(order, steps):
            c = models.pauli_evolution(n, terms, t, steps=steps, order=order)
            return np.max(np.abs(np.asarray(circuit_unitary(c)) - want))

        # Strang quarters the error when steps double (~dt^2)
        e10, e20 = err(2, 10), err(2, 20)
        assert e10 < 2e-3 and 3.0 < e10 / e20 < 5.0
        assert err(1, 40) < 2e-2


def test_pauli_evolution_parts_iterated():
    """One Trotter step as a run_device_iterated body equals the flat
    pauli_evolution circuit — the general-Hamiltonian on-device loop."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import gpu_quantum_simulator_tpu as Q

    n, dt, steps = 5, 0.05, 8
    terms = Q.models.heisenberg_terms(n, Jx=1, Jy=0.7, Jz=0.4, h=0.3)
    prefix, body = Q.models.pauli_evolution_parts(n, terms, dt, order=2)
    sim = Q.Simulator(Q.SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device_iterated(body, repetitions=steps,
                                        prefix=prefix)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = np.asarray(Q.simulate(
        Q.models.pauli_evolution(n, terms, dt * steps, steps=steps,
                                 order=2), strategy="mxu"))
    assert np.max(np.abs(got - want)) < 1e-5
