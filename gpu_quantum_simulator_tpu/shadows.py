"""Classical shadows: estimate many local observables from randomized
Pauli-basis measurements (Huang-Kueng-Preskill).

A measurement-budget estimator the reference (bitstring sampling only)
has no analog of: S snapshots, each measuring every qubit in a uniformly
random X/Y/Z basis, estimate EVERY k-local Pauli simultaneously with
variance ~3^k/S — the shot-frugal alternative to per-observable
measurement when the observable list is long.

TPU shape: the circuit runs ONCE; snapshots differ only in their basis
rotations, so a chunk of S' members is the state tiled to (S', 2^n) with
the member-dependent single-qubit rotations applied under ``jax.vmap``
(gathered from a (3, 2, 2) constant by the per-member basis draw) and one
``jax.random.categorical`` row-sample per member — rotations, collapse
and readout all stay on device; only the (S, n) basis array and the (S,)
outcome bits cross the boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit

# rotation to measure in basis b: 0 = X (H), 1 = Y (H Sdg), 2 = Z (I)
_SQ = 1.0 / np.sqrt(2.0)
_ROT = np.stack([
    np.array([[_SQ, _SQ], [_SQ, -_SQ]], dtype=complex),            # H
    np.array([[_SQ, -1j * _SQ], [_SQ, 1j * _SQ]], dtype=complex),  # H Sdg
    np.eye(2, dtype=complex),
])
_AXIS = {"X": 0, "Y": 1, "Z": 2}


def shadow_snapshots(
    circuit: Circuit,
    snapshots: int,
    seed: int = 0,
    config: Optional[SimulatorConfig] = None,
    max_batch_log2: int = 24,
) -> Tuple[np.ndarray, np.ndarray]:
    """(bases, outcomes): S random-Pauli-basis measurement snapshots.

    ``bases[s, q]`` in {0, 1, 2} = {X, Y, Z}; ``outcomes[s]`` = the sampled
    basis index (bit q = qubit q's result in its basis).  Chunked so a
    member batch never exceeds 2^max_batch_log2 amplitudes."""
    import jax
    import jax.numpy as jnp

    from .engine.simulator import Simulator
    from .ops.apply import apply_1q

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    n = circuit.num_qubits
    re, im, _ = sim.run_device(circuit)
    dt = re.dtype

    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 3, size=(int(snapshots), n), dtype=np.int8)

    rot_re = jnp.asarray(_ROT.real, dt)
    rot_im = jnp.asarray(_ROT.imag, dt)

    def one_member(re, im, brow, key):
        for q in range(n):
            ur = rot_re[brow[q]]
            ui = rot_im[brow[q]]
            re, im = apply_1q(re, im, ur, ui, q, n)
        logp = jnp.log(re * re + im * im + 1e-30)
        return jax.random.categorical(key, logp)

    @jax.jit
    def chunk(re, im, brows, keys):
        return jax.vmap(one_member, in_axes=(None, None, 0, 0))(
            re, im, brows, keys)

    S = int(snapshots)
    per = max(1, 1 << max(0, max_batch_log2 - n))
    keys = jax.random.split(jax.random.PRNGKey(seed), S)
    outs = []
    for lo in range(0, S, per):
        hi = min(S, lo + per)
        b = jnp.asarray(bases[lo:hi], jnp.int32)
        outs.append(np.asarray(chunk(re, im, b, keys[lo:hi])))
    return bases, np.concatenate(outs).astype(np.int64)


def shadows_expectation(
    circuit: Circuit,
    terms: Sequence[Tuple[float, str]],
    snapshots: int = 10000,
    seed: int = 0,
    groups: int = 10,
    config: Optional[SimulatorConfig] = None,
    _snapshot_data=None,
) -> float:
    """<H> = sum c_k <P_k> from ONE pool of classical-shadow snapshots.

    Each snapshot where every qubit in P's support drew P's basis
    contributes prod_supp 3 * (+-1); median-of-means over ``groups``
    batches tames heavy tails.  All terms share the pool — the estimator's
    whole point.  ``_snapshot_data``: reuse (bases, outcomes) from
    :func:`shadow_snapshots` across calls."""
    from .observables import _parse_pauli

    n = circuit.num_qubits
    if _snapshot_data is None:
        bases, outcomes = shadow_snapshots(circuit, snapshots, seed, config)
    else:
        bases, outcomes = _snapshot_data
    S = bases.shape[0]

    total = 0.0
    for coeff, pauli in terms:
        ops = _parse_pauli(pauli, n)
        if not ops:
            total += float(coeff)
            continue
        est = np.ones(S)
        for q, ax in ops.items():
            match = bases[:, q] == _AXIS[ax]
            sign = 1.0 - 2.0 * ((outcomes >> q) & 1)
            est = est * np.where(match, 3.0 * sign, 0.0)
        # median of means
        g = max(1, int(groups))
        cut = (S // g) * g
        means = est[:cut].reshape(g, -1).mean(axis=1) if cut else est
        total += float(coeff) * float(np.median(means))
    return total


def shadows_reduced_density(
    bases: np.ndarray,
    outcomes: np.ndarray,
    qubits: Sequence[int],
) -> np.ndarray:
    """Reconstruct the reduced density matrix of ``qubits`` from shadow
    snapshots: rho_A = E_s [ prod_q (3 U_q^dag |b_q><b_q| U_q - I) ].

    Little-endian over ``qubits`` in the given order.  Unbiased; error
    ~sqrt(4^k/S).  Feed the (bases, outcomes) pool from
    :func:`shadow_snapshots`."""
    qs = [int(q) for q in qubits]
    if len(set(qs)) != len(qs):
        raise ValueError("qubits must be distinct")
    S = bases.shape[0]
    # per-(basis, bit) single-qubit estimator 3 U^dag |b><b| U - I
    est = np.empty((3, 2, 2, 2), dtype=complex)
    for b in range(3):
        u = _ROT[b]
        for bit in range(2):
            proj = np.zeros((2, 2), dtype=complex)
            proj[bit, bit] = 1.0
            est[b, bit] = 3.0 * (u.conj().T @ proj @ u) - np.eye(2)
    rho = np.zeros((1 << len(qs),) * 2, dtype=complex)
    for s in range(S):
        m = np.array([[1.0]], dtype=complex)
        for q in qs:
            m = np.kron(est[bases[s, q], (int(outcomes[s]) >> q) & 1], m)
        rho += m
    rho /= S
    return rho
