"""Pauli-string observables vs dense linear algebra."""

import numpy as np
import pytest

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.observables import (
    expectation_pauli, expectation_pauli_sum)
from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]])
Z = np.diag([1.0, -1.0]).astype(complex)
P = {"I": I2, "X": X, "Y": Y, "Z": Z}


def dense_pauli(pauli: str, n: int) -> np.ndarray:
    # qubit k = bit k (little-endian): qubit 0 is the LAST kron factor
    sparse = " " in pauli or any(ch.isdigit() for ch in pauli)
    ops = {q: p for q, p in enumerate(pauli)} if not sparse else None
    if ops is None:
        ops = {}
        for term in pauli.split():
            ops[int(term[1:])] = term[0]
    m = np.array([[1.0]])
    for q in range(n):
        m = np.kron(P[ops.get(q, "I")], m)
    return m


@pytest.mark.parametrize("pauli", ["ZZIII", "XIIII", "IYIII", "XYZIX", "YYIIZ"])
def test_single_string_matches_dense(pauli):
    n = 5
    c = models.random_circuit(n, 60, seed=11)
    psi = simulate_reference(c)
    want = float(np.real(np.vdot(psi, dense_pauli(pauli, n) @ psi)))
    got = expectation_pauli(c, pauli, SimulatorConfig(strategy="mxu"))
    assert abs(got - want) < 1e-5
    got_ref = expectation_pauli(c, pauli, SimulatorConfig(strategy="reference"))
    assert abs(got_ref - want) < 1e-9


def test_sparse_spec_equivalent():
    n = 6
    c = models.grover_like(n, num_gates=80, seed=2)
    a = expectation_pauli(c, "X0 Z3 Y5", SimulatorConfig(strategy="reference"))
    b = expectation_pauli(c, "XIIZIY", SimulatorConfig(strategy="reference"))
    assert abs(a - b) < 1e-12


def test_hamiltonian_grouping_and_identity():
    n = 4
    c = models.random_circuit(n, 50, seed=3)
    psi = simulate_reference(c)
    terms = [(0.5, "ZIII"), (-1.25, "IIII"), (0.75, "XXII"), (0.3, "ZZII"),
             (0.1, "YIIZ")]
    h = sum(coeff * dense_pauli(p, n) for coeff, p in terms)
    want = float(np.real(np.vdot(psi, h @ psi)))
    got = expectation_pauli_sum(c, terms, SimulatorConfig(strategy="mxu"))
    assert abs(got - want) < 1e-5


def test_qwc_grouping_merges_compatible_bases():
    """Qubit-wise-commuting grouping: a TFIM's n X-terms + (n-1) ZZ-terms
    collapse to exactly 2 measurement groups (Z conflicts with an X
    rotation on the same qubit, so the letter maps stay separate), and
    the merged-basis evaluation still matches the dense Hamiltonian."""
    from gpu_quantum_simulator_tpu.observables import _parse_pauli, qwc_groups

    n = 5
    terms = models.tfim_terms(n, J=0.8, g=0.6)
    parsed = [(coeff, _parse_pauli(p, n)) for coeff, p in terms]
    bins = qwc_groups(parsed)
    assert len(bins) == 2, bins
    assert sum(len(m) for _, m in bins) == len(terms)
    assert {b for b, _ in bins} == {tuple((q, "X") for q in range(n)), ()}
    # disjoint-qubit terms share one execution; Y vs X on a qubit splits
    parsed2 = [(1.0, _parse_pauli(p, 3)) for p in
               ["X0", "X0 X1", "Y0", "Z0 Z1", "Y0 Z1", "Z2"]]
    bins2 = qwc_groups(parsed2)
    assert len(bins2) == 3
    sizes = {b: len(mm) for b, mm in bins2}
    # X0X1 absorbs X0 and the free-qubit Z2; Y0 absorbs Y0Z1; Z0Z1 alone
    assert sizes[((0, "X"), (1, "X"))] == 3
    assert sizes[((0, "Y"),)] == 2
    assert sizes[()] == 1

    c = models.random_circuit(n, 60, seed=21)
    psi = simulate_reference(c)
    h = sum(coeff * dense_pauli(p, n) for coeff, p in terms)
    want = float(np.real(np.vdot(psi, h @ psi)))
    got = expectation_pauli_sum(c, terms, SimulatorConfig(strategy="mxu"),
                                method="basis")
    assert abs(got - want) < 1e-5


def test_pauli_sum_inplace_halves_route():
    """<H> through the in-place split-state engine (the n >= 30 layout,
    forced at small n): each QWC group reduces on the four column halves
    with no flat-state materialization, matching the dense value."""
    n = 10
    c = models.random_circuit(n, 80, seed=13)
    terms = models.tfim_terms(n, J=0.9, g=0.5) + [(0.3, "Y2 X7")]
    psi = simulate_reference(c)
    h = sum(coeff * dense_pauli(p, n) for coeff, p in terms)
    want = float(np.real(np.vdot(psi, h @ psi)))
    got = expectation_pauli_sum(
        c, terms,
        SimulatorConfig(strategy="prefetch", prefetch_inplace=True),
        method="basis")
    assert abs(got - want) < 1e-4


def test_bad_strings_rejected():
    c = models.ghz(3)
    with pytest.raises(ValueError):
        expectation_pauli(c, "ZZ", SimulatorConfig(strategy="reference"))
    with pytest.raises(ValueError):
        expectation_pauli(c, "Q0", SimulatorConfig(strategy="reference"))


def test_overlap_and_fidelity():
    import numpy as np
    import gpu_quantum_simulator_tpu as Q
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    c1 = models.random_circuit(5, 40, seed=3)
    c2 = models.random_circuit(5, 40, seed=4)
    want = complex(np.vdot(simulate_reference(c1), simulate_reference(c2)))
    got = Q.overlap(c1, c2)
    assert abs(got - want) < 1e-5
    assert Q.state_fidelity(c1, c1) == pytest.approx(1.0, abs=1e-5)
    # circuit vs explicit vector, and width mismatch error
    v = simulate_reference(c2)
    got2 = Q.overlap(c1, v)
    assert abs(got2 - want) < 1e-5
    with pytest.raises(ValueError):
        Q.overlap(c1, models.ghz(4))
    with pytest.raises(ValueError):
        Q.overlap(c1, np.ones(5, dtype=complex))


def test_pauli_sum_state_method_matches_basis():
    """method='state' (ONE execution, per-term device passes) agrees with
    method='basis' (one execution per measurement basis) and with auto."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.observables import expectation_pauli_sum

    c = models.random_circuit(6, 120, seed=9)
    terms = [(0.8, "Z0 Z3"), (-0.4, "X1"), (0.3, "Y2 X4"),
             (0.5, "Z5"), (1.1, "I" * 6), (-0.2, "X1 Z0")]
    e_basis = expectation_pauli_sum(c, terms, method="basis")
    e_state = expectation_pauli_sum(c, terms, method="state")
    e_auto = expectation_pauli_sum(c, terms)
    assert abs(e_state - e_basis) < 1e-5
    assert abs(e_auto - e_basis) < 1e-5

    import pytest

    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    with pytest.raises(ValueError):
        expectation_pauli_sum(c, terms, method="bogus")
    with pytest.raises(ValueError):
        expectation_pauli_sum(
            c, terms, config=SimulatorConfig(strategy="reference"),
            method="state")


def test_marginal_probabilities_match_full_distribution():
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import marginal_probabilities

    n = 6
    c = models.random_circuit(n, 80, seed=21)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device(c)
    full = np.abs(sim.run(c)) ** 2

    for qs in ([0], [5], [2, 4], [4, 2], [1, 3, 5], list(range(n))):
        got = marginal_probabilities(re, im, qs, n)
        want = np.zeros(1 << len(qs))
        for i, p in enumerate(full):
            key = 0
            for j, q in enumerate(qs):
                key |= ((i >> q) & 1) << j
            want[key] += p
        assert np.max(np.abs(got - want)) < 1e-5, qs
        assert abs(got.sum() - 1.0) < 1e-5

    import pytest
    with pytest.raises(ValueError):
        marginal_probabilities(re, im, [0, 0], n)
    with pytest.raises(ValueError):
        marginal_probabilities(re, im, [n], n)


def test_marginal_probabilities_halves_matches_flat():
    """Split-state marginals (n >= 30 layout, forced at small n) agree
    with flat-state marginals across lane/half/row qubit picks and
    requested-order permutations."""
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import (
        marginal_probabilities, marginal_probabilities_halves)

    n = 11
    c = models.grover_like(n, num_gates=200, seed=17)
    sim = Simulator(SimulatorConfig(strategy="prefetch",
                                    prefetch_inplace=True))
    parts, _ = sim.run_device_halves(c)
    flat = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    re, im = jnp.asarray(flat.real), jnp.asarray(flat.imag)

    for qs in ([0], [7], [9], [3, 7], [10, 7, 2], [8, 1], [6, 5, 9, 7]):
        want = marginal_probabilities(re, im, qs, n)
        got = marginal_probabilities_halves(*parts, qs, n)
        assert np.max(np.abs(got - want)) < 1e-6, qs
        assert abs(got.sum() - 1.0) < 1e-5
    with pytest.raises(ValueError):
        marginal_probabilities_halves(*parts, [0, 0], n)
    with pytest.raises(ValueError):
        marginal_probabilities_halves(*parts, [n], n)


def test_entanglement_entropy_halves_matches_flat():
    import jax.numpy as jnp

    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import (
        entanglement_entropy, entanglement_entropy_halves)

    n = 11
    c = models.grover_like(n, num_gates=220, seed=29)
    sim = Simulator(SimulatorConfig(strategy="prefetch",
                                    prefetch_inplace=True))
    parts, _ = sim.run_device_halves(c)
    flat = Simulator(SimulatorConfig(strategy="prefetch")).run(c)
    re, im = jnp.asarray(flat.real), jnp.asarray(flat.imag)
    for cut in (1, 3, 7):
        want = entanglement_entropy(re, im, cut, n)
        got = entanglement_entropy_halves(*parts, cut, n)
        assert abs(got - want) < 1e-4, (cut, got, want)
    with pytest.raises(ValueError):
        entanglement_entropy_halves(*parts, 8, n)


def test_entanglement_entropy_known_values():
    import jax.numpy as jnp
    import pytest

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import entanglement_entropy

    sim = Simulator(SimulatorConfig(strategy="mxu"))

    # product state: zero entropy at every cut
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit as C

    prod = C(4)
    prod.h(0).ry(0.7, 1).rz(0.3, 2)
    re, im, _ = sim.run_device(prod)
    for cut in (1, 2, 3):
        assert entanglement_entropy(re, im, cut, 4) < 1e-5

    # GHZ: any bipartition carries exactly 1 bit
    re, im, _ = sim.run_device(models.ghz(6))
    for cut in (1, 3, 5):
        assert abs(entanglement_entropy(re, im, cut, 6) - 1.0) < 1e-5

    # random state: matches the exact SVD entropy
    c = models.random_circuit(6, 120, seed=8)
    re, im, _ = sim.run_device(c)
    got = entanglement_entropy(re, im, 3, 6)
    v = np.asarray(sim.run(c)).reshape(8, 8)   # rows = high qubits
    s = np.linalg.svd(v, compute_uv=False) ** 2
    s = s[s > 1e-12]
    want = float(-(s * np.log2(s)).sum())
    assert abs(got - want) < 1e-4

    with pytest.raises(ValueError):
        entanglement_entropy(re, im, 0, 6)
    with pytest.raises(ValueError):
        entanglement_entropy(re, im, 6, 6)


def test_quench_entropy_growth_composes_device_stepping():
    """TFIM quench via run_device_parts: half-chain entropy grows from 0
    and <Z> decays from 1 — regression for the demo's composition path."""
    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import entanglement_entropy
    from gpu_quantum_simulator_tpu.sampling import expectation_z

    n, dt = 8, 0.05
    prefix, _, _ = models.trotter_tfim_parts(n, dt, steps=1)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    re, im, _ = sim.run_device(prefix)
    assert entanglement_entropy(re, im, n // 2, n) < 1e-6
    assert abs(expectation_z(re, im, [n // 2], n) - 1.0) < 1e-6

    entropies = []
    for _ in range(3):
        re, im, _ = sim.run_device_parts(
            models.trotter_tfim(n, dt, steps=10), (re, im))
        entropies.append(entanglement_entropy(re, im, n // 2, n))
    assert entropies[0] > 0.01
    assert entropies[-1] > entropies[0]          # still growing at t=1.5
    assert expectation_z(re, im, [n // 2], n) < 0.9


class TestPauliDecompose:
    """Hermitian matrix -> (coeff, pauli) terms, round-trip exact."""

    def test_roundtrip_random_hermitian(self):
        import numpy as np
        import gpu_quantum_simulator_tpu as Q
        from gpu_quantum_simulator_tpu.observables import _parse_pauli

        P1 = {"X": np.array([[0, 1], [1, 0]]),
              "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}
        rng = np.random.default_rng(0)
        for k in (1, 2, 3):
            z = (rng.standard_normal((1 << k, 1 << k))
                 + 1j * rng.standard_normal((1 << k, 1 << k)))
            h = (z + z.conj().T) / 2
            re = np.zeros((1 << k, 1 << k), dtype=complex)
            for coef, spec in Q.pauli_decompose(h):
                ops = _parse_pauli(spec, k)
                m = np.eye(1)
                for q in reversed(range(k)):
                    m = np.kron(m, P1[ops[q]] if q in ops else np.eye(2))
                re += coef * m
            assert np.max(np.abs(re - h)) < 1e-9

    def test_known_operators(self):
        import numpy as np
        import gpu_quantum_simulator_tpu as Q

        # ZZ has exactly one term; the number operator = (I - Z)/2
        zz = np.diag([1.0, -1, -1, 1])
        assert Q.pauli_decompose(zz) == [(1.0, "Z0 Z1")]
        nop = np.diag([0.0, 1.0])
        terms = dict((s, c) for c, s in Q.pauli_decompose(nop))
        assert abs(terms["I0"] - 0.5) < 1e-12
        assert abs(terms["Z0"] + 0.5) < 1e-12

    def test_guards(self):
        import numpy as np
        import pytest
        import gpu_quantum_simulator_tpu as Q

        with pytest.raises(ValueError, match="Hermitian"):
            Q.pauli_decompose(np.array([[0.0, 1], [0, 0]]))
        with pytest.raises(ValueError, match="2\\^k"):
            Q.pauli_decompose(np.eye(3))
        with pytest.raises(ValueError, match="qubit labels"):
            Q.pauli_decompose(np.eye(4), qubits=(0,))
