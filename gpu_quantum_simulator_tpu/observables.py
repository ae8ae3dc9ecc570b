"""Pauli-string observables: expectations of arbitrary I/X/Y/Z strings
and their weighted sums (Hamiltonians).

Beyond-reference capability (the reference measures nothing but sampled
bitstrings).  Implementation is engine-agnostic and TPU-friendly: an
X/Y factor is rotated into the Z basis by appending one-qubit basis
changes to the circuit (X -> H, Y -> S^dag then H), after which the
diagonal Z-string reduces on device (sampling.expectation_z) with no
state transfer.  Strings are grouped by qubit-wise commutation (distinct
bases merge whenever no qubit demands two different rotations), so a
k-term Hamiltonian costs one circuit execution per QWC group, not per
term — e.g. a transverse-field Ising H runs in 2 executions total.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit


def _parse_pauli(pauli: str, num_qubits: int) -> Dict[int, str]:
    """{'X'|'Y'|'Z' by qubit} from either a dense string ("IXZY", qubit 0
    leftmost) or a sparse spec ("X0 Z3 Y5")."""
    ops: Dict[int, str] = {}
    s = pauli.strip().upper()
    if " " in s or any(ch.isdigit() for ch in s):
        for term in s.split():
            p, q = term[0], int(term[1:])
            if p not in "IXYZ":
                raise ValueError(f"bad Pauli factor {term!r}")
            if q >= num_qubits:
                raise ValueError(f"qubit {q} out of range in {pauli!r}")
            if p != "I":
                ops[q] = p
    else:
        if len(s) != num_qubits:
            raise ValueError(
                f"dense Pauli string length {len(s)} != {num_qubits} qubits")
        for q, p in enumerate(s):
            if p not in "IXYZ":
                raise ValueError(f"bad Pauli factor {p!r}")
            if p != "I":
                ops[q] = p
    return ops


def qwc_groups(
    terms: Sequence[Tuple[float, Dict[int, str]]],
) -> List[Tuple[tuple, List[Tuple[float, Dict[int, str]]]]]:
    """Bin parsed Pauli terms into qubit-wise-commuting groups.

    Terms are QWC-compatible when no qubit carries two DIFFERENT letters
    across them (I is compatible with anything; Z conflicts with an X/Y
    rotation on the same qubit).  Each bin measures once under the
    non-Z rotations of its merged letter map, and every member reduces
    as a Z-string on its own qubits in that frame.  Greedy first-fit
    over terms sorted widest-first: a TFIM's n X-terms + (n-1) ZZ-terms
    collapse from n+1 distinct bases to 2 executions, and disjoint
    terms (Z0, X1) share one execution.  Returns
    [(rotation_basis, members)] in deterministic order."""
    bins: List[Tuple[Dict[int, str], List[Tuple[float, Dict[int, str]]]]] = []
    order = sorted(range(len(terms)),
                   key=lambda i: (-len(terms[i][1]),
                                  sorted(terms[i][1].items())))
    for i in order:
        coeff, ops = terms[i]
        for letters, members in bins:
            if all(letters.get(q, p) == p for q, p in ops.items()):
                letters.update(ops)
                members.append((coeff, ops))
                break
        else:
            bins.append((dict(ops), [(coeff, ops)]))
    return [(tuple(sorted((q, p) for q, p in letters.items() if p != "Z")),
             members) for letters, members in bins]


def _with_rotations(circuit: Circuit, basis) -> Circuit:
    c = Circuit(circuit.num_qubits, list(circuit.gates))
    for q, p in basis:
        if p == "X":
            c.h(q)
        elif p == "Y":
            c.sdg(q)
            c.h(q)
    return c


def apply_pauli_parts(re, im, ops: Dict[int, str], num_qubits: int):
    """P|psi> for one Pauli string on a split (re, im) device state.

    Traced helper shared by the state-method expectation evaluator and
    the adjoint gradient engines (X = pair flip, Y = flip with the i
    factor rotated into the parts, Z = sign mask)."""
    import jax.numpy as jnp

    n = num_qubits
    for q, ax in ops.items():
        hi, lo = 1 << (n - 1 - q), 1 << q
        r = re.reshape(hi, 2, lo)
        i = im.reshape(hi, 2, lo)
        if ax == "X":
            re, im = r[:, ::-1, :].reshape(-1), i[:, ::-1, :].reshape(-1)
        elif ax == "Y":
            # (Y v)_0 = -i v_1, (Y v)_1 = i v_0
            re = jnp.stack([i[:, 1, :], -i[:, 0, :]], 1).reshape(-1)
            im = jnp.stack([-r[:, 1, :], r[:, 0, :]], 1).reshape(-1)
        else:
            sign = jnp.array([1.0, -1.0], re.dtype).reshape(1, 2, 1)
            re, im = (r * sign).reshape(-1), (i * sign).reshape(-1)
    return re, im


def inner_parts(lr, li, pr, pi):
    """<lambda|psi> of two split states as (Re, Im) scalars."""
    import jax.numpy as jnp

    return (jnp.vdot(lr, pr) + jnp.vdot(li, pi),
            jnp.vdot(lr, pi) - jnp.vdot(li, pr))


def expectation_pauli(
    circuit: Circuit,
    pauli: str,
    config: Optional[SimulatorConfig] = None,
) -> float:
    """<P> for one Pauli string after running ``circuit``."""
    return expectation_pauli_sum(circuit, [(1.0, pauli)], config)


def expectation_pauli_sum(
    circuit: Circuit,
    terms: Sequence[Tuple[float, str]],
    config: Optional[SimulatorConfig] = None,
    method: str = "auto",
) -> float:
    """<H> for H = sum_k c_k P_k.

    ``method="basis"``: one circuit execution per qubit-wise-commuting
    group of terms (see ``qwc_groups``); all Z-string reductions for a
    group run on the same device state.  ``method="state"``: ONE
    execution total — every term evaluates as a device-side <psi|P|psi>
    pass on the final
    state (needs a second state resident, n <= 28; wins whenever the
    circuit is deeper than one state pass per extra basis, i.e. almost
    always).  ``"auto"`` picks "state" when several bases exist and the
    width allows it.  Under the in-place split-state engine (n >= 30, or
    ``prefetch_inplace=True``) the basis method reduces each group on the
    four column halves (``sampling.expectation_z_halves``) — <H> works at
    the largest widths with no flat-state materialization.
    """
    from .engine.simulator import Simulator
    from .sampling import expectation_z

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    n = circuit.num_qubits

    parsed: List[Tuple[float, Dict[int, str]]] = []
    const = 0.0
    for coeff, pauli in terms:
        ops = _parse_pauli(pauli, n)
        if not ops:
            const += coeff          # identity term
            continue
        parsed.append((float(coeff), ops))

    bins = qwc_groups(parsed)
    if method not in ("auto", "basis", "state"):
        raise ValueError(f"unknown method {method!r}")
    if method == "auto":
        method = ("state" if len(bins) > 1 and n <= 28
                  and cfg.strategy != "reference" else "basis")
    if method == "state":
        if cfg.strategy == "reference":
            raise ValueError("method='state' needs a device engine")
        import jax

        re, im, _ = sim.run_device(circuit)

        def eval_terms(re, im):
            import jax.numpy as jnp

            total = jnp.zeros((), re.dtype)
            for coeff, ops in parsed:
                tr, ti = apply_pauli_parts(re, im, ops, n)
                total = total + coeff * (jnp.vdot(re, tr) + jnp.vdot(im, ti))
            return total

        return const + float(jax.jit(eval_terms)(re, im))

    # split-state route: the in-place prefetch engine (n >= 30, or forced
    # via prefetch_inplace) never materializes a flat 2^n pair — measure
    # each group's Z-strings on the four column halves instead
    halves = (cfg.strategy == "prefetch" and sim._prefetch_inplace(n))

    total = const
    for basis, members in bins:
        rotated = _with_rotations(circuit, basis)
        if halves:
            from .sampling import expectation_z_halves

            parts, _ = sim.run_device_halves(rotated)
            for coeff, ops in members:
                total += coeff * expectation_z_halves(*parts, list(ops), n)
            continue
        if cfg.strategy == "reference":
            state = sim.run(rotated)
            p = np.abs(state) ** 2
            idx = np.arange(p.shape[0])
            for coeff, ops in members:
                par = np.zeros_like(idx)
                for q in ops:
                    par ^= (idx >> q) & 1
                total += coeff * float(np.sum(p * (1.0 - 2.0 * par)))
            continue
        re, im, _ = sim.run_device(rotated)
        for coeff, ops in members:
            total += coeff * expectation_z(re, im, list(ops), n)
    return total


def overlap(a, b, config: Optional[SimulatorConfig] = None) -> complex:
    """<psi_a | psi_b> with both states device-resident.

    ``a`` / ``b``: a Circuit (executed from |0...0>) or an explicit complex
    state vector.  The inner product reduces on device — four dot products
    on the split (re, im) pairs — so only one complex scalar crosses the
    device boundary.  Both states must fit in HBM simultaneously (n <= 29
    in float32 on one v5e chip)."""
    import jax.numpy as jnp

    from .engine.simulator import Simulator

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)

    def parts(x):
        if isinstance(x, Circuit):
            re, im, _ = sim.run_device(x)
            return re, im, x.num_qubits
        arr = np.asarray(x)
        n = int(arr.shape[0]).bit_length() - 1
        if arr.shape[0] != 1 << n:
            raise ValueError(f"state length {arr.shape[0]} is not a power of 2")
        dt = jnp.float64 if cfg.dtype == "complex128" else jnp.float32
        return (jnp.asarray(arr.real, dt), jnp.asarray(arr.imag, dt), n)

    ra, ia, na = parts(a)
    rb, ib, nb = parts(b)
    if na != nb:
        raise ValueError(f"state widths differ: {na} vs {nb} qubits")
    # conj(a) . b = (ra - i ia) . (rb + i ib)
    real = jnp.vdot(ra, rb) + jnp.vdot(ia, ib)
    imag = jnp.vdot(ra, ib) - jnp.vdot(ia, rb)
    return complex(float(real), float(imag))


def state_fidelity(a, b, config: Optional[SimulatorConfig] = None) -> float:
    """|<psi_a | psi_b>|^2 (pure-state fidelity), device-side reduction."""
    v = overlap(a, b, config)
    return v.real * v.real + v.imag * v.imag


def marginal_probabilities(re, im, qubits: Sequence[int],
                           num_qubits: int) -> np.ndarray:
    """Marginal outcome distribution over ``qubits`` (little-endian in the
    given order), reduced device-side.

    Unselected qubits are summed out one at a time as rank-3
    (hi, 2, lo) reductions — never a (2,)*n reshape (XLA pads minor
    (2, 2) axes to (8, 128) tiles: 64x memory).  Only the final
    2^len(qubits) vector reaches the host.
    """
    import jax
    import jax.numpy as jnp

    qs = [int(q) for q in qubits]
    if len(set(qs)) != len(qs):
        raise ValueError("qubits must be distinct")
    for q in qs:
        if not 0 <= q < num_qubits:
            raise ValueError(f"qubit {q} out of range")

    keep = sorted(qs)

    @jax.jit
    def reduce_(re, im):
        p = re * re + im * im
        n = num_qubits
        # sum out unselected qubits from high to low so positions of the
        # remaining ones stay valid
        for q in range(num_qubits - 1, -1, -1):
            if q in keep:
                continue
            hi, lo = 1 << (n - 1 - q), 1 << q
            p = p.reshape(hi, 2, lo).sum(axis=1).reshape(-1)
            n -= 1
        return p

    p = np.asarray(reduce_(re, im))
    return _reorder_marginal(p, keep, qs)


def _reorder_marginal(p: np.ndarray, keep, qs) -> np.ndarray:
    """Permute a little-endian-over-sorted(qs) marginal to the requested
    qubit order."""
    k = len(qs)
    if keep == qs or k == 0:
        return p
    pos = {q: i for i, q in enumerate(keep)}
    idx = np.arange(1 << k)
    out_idx = np.zeros_like(idx)
    for j, q in enumerate(qs):
        out_idx |= ((idx >> pos[q]) & 1) << j
    res = np.zeros_like(p)
    res[out_idx] = p
    return res


def marginal_probabilities_halves(re0, re1, im0, im1, qubits: Sequence[int],
                                  num_qubits: int) -> np.ndarray:
    """Marginal distribution over ``qubits`` from a column-half-split
    state (the n >= 30 in-place layout; ``Simulator.run_device_halves``).

    Each half is a (2^(n-8), 128) block — qubits 0..6 are the lanes,
    qubit 7 selects the half, qubits 8.. are the rows — so both halves
    reduce device-side over their own (n-1)-bit index space exactly like
    :func:`marginal_probabilities` (rank-3 sums, never a (2,)*n
    reshape), and the two small results combine across qubit 7 on the
    host.  Only 2^len(qubits) floats per half reach the host."""
    import jax

    qs = [int(q) for q in qubits]
    if len(set(qs)) != len(qs):
        raise ValueError("qubits must be distinct")
    for q in qs:
        if not 0 <= q < num_qubits:
            raise ValueError(f"qubit {q} out of range")

    keep = sorted(qs)
    # within one half, original qubit q maps to bit q (q < 7) or q-1 (q > 7)
    mapped = {q if q < 7 else q - 1 for q in keep if q != 7}
    nn = num_qubits - 1

    @jax.jit
    def reduce_half(re, im):
        p = (re * re + im * im).reshape(-1)
        m = nn
        for q in range(nn - 1, -1, -1):
            if q in mapped:
                continue
            hi, lo = 1 << (m - 1 - q), 1 << q
            p = p.reshape(hi, 2, lo).sum(axis=1).reshape(-1)
            m -= 1
        return p

    p0 = np.asarray(reduce_half(re0, im0))
    p1 = np.asarray(reduce_half(re1, im1))
    if 7 in keep:
        j7 = keep.index(7)
        i = np.arange(1 << (len(keep) - 1))
        base = (i & ((1 << j7) - 1)) | ((i >> j7) << (j7 + 1))
        p = np.zeros(1 << len(keep), dtype=p0.dtype)
        p[base] = p0
        p[base | (1 << j7)] = p1
    else:
        p = p0 + p1
    return _reorder_marginal(p, keep, qs)


def entanglement_entropy(re, im, cut: int, num_qubits: int,
                         base: float = 2.0) -> float:
    """Von Neumann entropy of the reduced state of qubits [0, cut).

    TPU-safe route: the state viewed as a (2^(n-cut), 2^cut) matrix V
    never needs an SVD on device — the reduced density matrix
    rho = V^dagger V is a small (2^cut, 2^cut) Hermitian formed by two
    MXU matmul pairs, fetched to the host, and diagonalized there.
    ``cut <= ~13`` keeps rho tiny at any n.  Entropy in bits by default
    (``base=np.e`` for nats).
    """
    import jax
    import jax.numpy as jnp

    if not 1 <= cut < num_qubits:
        raise ValueError(f"cut must be in [1, {num_qubits - 1}], got {cut}")
    if cut > 14:
        raise ValueError(f"cut {cut} gives a 4^{cut}-entry density matrix; "
                         "cut from the smaller side")
    D = 1 << cut

    @jax.jit
    def rho(re, im):
        vr = re.reshape(-1, D)
        vi = im.reshape(-1, D)
        dot = lambda a, b: jnp.dot(
            a.T, b, preferred_element_type=vr.dtype,
            precision=jax.lax.Precision.HIGHEST)
        # rho = V^dagger V = (vr - i vi)^T (vr + i vi)
        return dot(vr, vr) + dot(vi, vi), dot(vr, vi) - dot(vi, vr)

    rr, ri = (np.asarray(x, dtype=np.float64) for x in rho(re, im))
    return _entropy_of_rho(rr, ri, base)


def _entropy_of_rho(rr: np.ndarray, ri: np.ndarray, base: float) -> float:
    w = np.linalg.eigvalsh(rr + 1j * ri)
    w = w[w > 1e-12]
    w = w / w.sum()
    return float(-(w * (np.log(w) / np.log(base))).sum())


def entanglement_entropy_halves(re0, re1, im0, im1, cut: int,
                                num_qubits: int, base: float = 2.0) -> float:
    """Von Neumann entropy of qubits [0, cut) from a column-half-split
    state (the n >= 30 in-place layout).

    For ``cut <= 7`` the cut qubits are lane bits inside BOTH halves, so
    rho = V0^dagger V0 + V1^dagger V1 with V_h = half h viewed as a
    (2^(n-1-cut), 2^cut) matrix — two MXU matmul pairs per half, a
    (2^cut)^2 host fetch, eigvalsh on the host (the split-state twin of
    :func:`entanglement_entropy`)."""
    import jax
    import jax.numpy as jnp

    if not 1 <= cut <= 7:
        raise ValueError("split-state entropy supports lane cuts 1..7; "
                         f"got {cut}")
    D = 1 << cut

    @jax.jit
    def rho_half(re, im):
        vr = re.reshape(-1, D)
        vi = im.reshape(-1, D)
        dot = lambda a, b: jnp.dot(
            a.T, b, preferred_element_type=vr.dtype,
            precision=jax.lax.Precision.HIGHEST)
        return dot(vr, vr) + dot(vi, vi), dot(vr, vi) - dot(vi, vr)

    rr0, ri0 = rho_half(re0, im0)
    rr1, ri1 = rho_half(re1, im1)
    rr = np.asarray(rr0, dtype=np.float64) + np.asarray(rr1, dtype=np.float64)
    ri = np.asarray(ri0, dtype=np.float64) + np.asarray(ri1, dtype=np.float64)
    return _entropy_of_rho(rr, ri, base)


def pauli_decompose(matrix, qubits: Optional[Sequence[int]] = None,
                    tol: float = 1e-12) -> List[Tuple[float, str]]:
    """Decompose a Hermitian matrix into (coeff, pauli) terms — the format
    ``expectation_pauli_sum`` / ``models.pauli_evolution`` consume.

    ``matrix``: (2^k, 2^k) Hermitian over k <= 6 qubits, basis index
    bit i = qubits[i] (the library convention).  ``qubits``: the qubit
    labels used in the emitted sparse specs (default 0..k-1).  Terms with
    |coeff| <= tol are dropped.  Cost O(8^k) — instant through k = 6.

    With ``Circuit.unitary``/``pauli_evolution`` this closes the loop:
    any few-body Hermitian observable or Hamiltonian becomes Pauli terms
    for measurement grouping, Trotterization, or VQE objectives."""
    import itertools

    m = np.asarray(matrix, dtype=complex)
    k = int(round(np.log2(m.shape[0])))
    if m.shape != (1 << k, 1 << k) or 1 << k != m.shape[0]:
        raise ValueError(f"matrix shape {m.shape} is not (2^k, 2^k)")
    if k > 6:
        raise ValueError("pauli_decompose supports up to 6 qubits")
    if np.max(np.abs(m - m.conj().T)) > 1e-9:
        raise ValueError("matrix is not Hermitian")
    if qubits is None:
        qubits = tuple(range(k))
    qubits = tuple(qubits)
    if len(qubits) != k:
        raise ValueError(f"{k}-qubit matrix needs {k} qubit labels")

    P1 = {"I": np.eye(2, dtype=complex),
          "X": np.array([[0, 1], [1, 0]], dtype=complex),
          "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
          "Z": np.array([[1, 0], [0, -1]], dtype=complex)}
    out: List[Tuple[float, str]] = []
    for letters in itertools.product("IXYZ", repeat=k):
        # letters[i] acts on qubits[i] = basis bit i -> kron high..low
        p = np.eye(1, dtype=complex)
        for ch in reversed(letters):
            p = np.kron(p, P1[ch])
        coeff = np.trace(p.conj().T @ m) / (1 << k)
        if abs(coeff.imag) > 1e-9:  # pragma: no cover - Hermitian guard
            raise AssertionError("non-real Pauli coefficient")
        if abs(coeff.real) <= tol:
            continue
        if all(ch == "I" for ch in letters):
            spec = "I0"         # identity term: constant offset
        else:
            spec = " ".join(f"{ch}{qubits[i]}"
                            for i, ch in enumerate(letters) if ch != "I")
        out.append((float(coeff.real), spec))
    return out
