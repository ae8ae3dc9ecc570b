"""Gradients of observable expectations w.r.t. gate parameters.

The reference has no training/VQE story at all; this closes the gap the
TPU-native way: the parameter-shift rule evaluates exact gradients with two
full circuit executions per parameter, so EVERY engine (including the
recompile-free ``prefetch`` flagship, where shifted circuits reuse the same
executables) doubles as a gradient engine.  Valid for the single-parameter
rotation family in the gate set — rz/rx/ry/p all have generators with
eigenvalues {0, ±1/2} (rz(θ) = diag(1, e^{iθ}), quantum_simulator.c:205-208
phase convention), for which

    dE/dθ = [E(θ + π/2) − E(θ − π/2)] / 2.

For small systems ``expectation_fn`` can instead be fed to jax.grad through
a differentiable rebuild; parameter-shift needs no tracing and matches f64
finite differences to ~1e-6 (tests/test_gradients.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit

SHIFT_RULE_GATES = ("rz", "rx", "ry", "p")


def parameterized_gates(circuit: Circuit) -> List[int]:
    """Indices of gates the shift rule differentiates."""
    return [
        i
        for i, g in enumerate(circuit.gates)
        if g.name in SHIFT_RULE_GATES and g.params
    ]


def _shifted(circuit: Circuit, gate_index: int, delta: float) -> Circuit:
    c = Circuit(circuit.num_qubits, list(circuit.gates))
    g = c.gates[gate_index]
    c.gates[gate_index] = type(g)(g.name, g.qubits, (g.params[0] + delta,))
    return c


def expectation(circuit: Circuit, z_qubits: Sequence[int],
                config: Optional[SimulatorConfig] = None) -> float:
    """<Z_{q1} Z_{q2} ...> after running ``circuit`` (device-side reduce)."""
    from .engine.simulator import Simulator
    from .sampling import expectation_z

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    if cfg.strategy == "reference":  # host engine: reduce on host
        state = sim.run(circuit)
        zmask = 0
        for q in z_qubits:
            zmask |= 1 << q
        signs = 1.0 - 2.0 * (
            np.bitwise_count(np.arange(state.size) & zmask).astype(np.int64) & 1
        )
        return float(np.sum(signs * np.abs(state) ** 2))
    re, im, _ = sim.run_device(circuit)
    return expectation_z(re, im, z_qubits, circuit.num_qubits)


def parameter_shift(
    circuit: Circuit,
    z_qubits: Sequence[int] = (),
    config: Optional[SimulatorConfig] = None,
    gate_indices: Optional[Sequence[int]] = None,
    expectation_fn=None,
) -> Tuple[np.ndarray, List[int]]:
    """(gradient array, gate indices): d<Z...>/dθ_k for each rotation gate.

    2 executions per parameter; with ``strategy="prefetch"`` the shifted
    circuits share every compiled executable, so a full gradient sweep is
    pure table-upload + execution.  ``expectation_fn(circuit) -> float``
    replaces the default Z-string expectation — any objective that is a
    fixed functional of the circuit works (e.g. a noisy Pauli sum: the
    shift rule stays exact because the channels are θ-independent).
    """
    if expectation_fn is None:
        expectation_fn = lambda c: expectation(c, z_qubits, config)
    idxs = list(gate_indices) if gate_indices is not None else parameterized_gates(circuit)
    grads = np.zeros(len(idxs))
    for j, i in enumerate(idxs):
        plus = expectation_fn(_shifted(circuit, i, math.pi / 2))
        minus = expectation_fn(_shifted(circuit, i, -math.pi / 2))
        grads[j] = 0.5 * (plus - minus)
    return grads, idxs


def parameter_shift_noisy(
    circuit: Circuit,
    terms,
    shots: int = 4096,
    kind: str = "depolarizing",
    p1: float = 0.0,
    p2: float = 0.0,
    seed: int = 0,
    config: Optional[SimulatorConfig] = None,
    gate_indices: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[int]]:
    """Parameter-shift gradient of a noisy Pauli-sum expectation.

    Each shifted evaluation is a batched trajectory ensemble
    (dynamic.expectation_noisy) with a FIXED seed, so the plus/minus
    pair shares the noise realizations — common-random-numbers variance
    reduction on top of the exact shift rule."""
    from .dynamic import expectation_noisy

    fn = lambda c: expectation_noisy(
        c, terms, shots=shots, kind=kind, p1=p1, p2=p2, seed=seed,
        config=config)
    return parameter_shift(circuit, (), config, gate_indices, fn)


def adjoint_gradient(
    circuit: Circuit,
    terms=None,
    z_qubits: Sequence[int] = (),
    config: Optional[SimulatorConfig] = None,
    gate_indices: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[int]]:
    """(gradient array, gate indices) by ADJOINT differentiation.

    One forward execution (any engine) + ONE backward sweep computes the
    gradient of <H> w.r.t. EVERY rotation parameter simultaneously —
    O(1) circuit-equivalents total vs parameter-shift's 2 per parameter.
    The sweep walks the gate list in reverse, undoing each gate on both
    the state and the adjoint vector lambda = H psi; a parameterized
    gate's gradient is a sparse inner product between the two
    (rz/p: masked product on the qubit's |1> half, dU = i P1 U;
    rx/ry: a flip/Y product, dU = -(i/2) {X,Y} U).

    ``terms``: Pauli-sum spec [(coeff, "Z0 Z1"), ...]; ``z_qubits`` is the
    single-Z-string shorthand.  The backward program is one jitted
    function per circuit (matrices baked as constants, megakernel-style)
    — for recompile-free sweeps at fixed width use parameter_shift with
    strategy='prefetch'; adjoint wins when parameters are many.
    Needs psi and lambda resident together: n <= 28 on one v5e chip.
    """
    import jax
    import jax.numpy as jnp

    from .engine.simulator import Simulator
    from .ir.gates import matrix_1q
    from .observables import _parse_pauli, apply_pauli_parts, inner_parts
    from .ops.apply import apply_1q, apply_cnot

    if terms is None:
        terms = [(1.0, " ".join(f"Z{q}" for q in z_qubits))]
    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    n = circuit.num_qubits
    idxs = (list(gate_indices) if gate_indices is not None
            else parameterized_gates(circuit))
    idx_set = set(idxs)
    for i in idx_set:
        if circuit.gates[i].name not in SHIFT_RULE_GATES:
            raise ValueError(
                f"gate {circuit.gates[i].name!r} has no adjoint rule")

    re, im, _ = sim.run_device(circuit)
    real_dtype = re.dtype

    parsed = []
    for coeff, pauli in terms:
        parsed.append((float(coeff), _parse_pauli(pauli, n)))

    def apply_pauli(re, im, ops):
        return apply_pauli_parts(re, im, ops, n)

    inner = inner_parts

    gates = list(circuit.gates)

    def backward(re, im):
        lr = jnp.zeros_like(re)
        li = jnp.zeros_like(im)
        for coeff, ops in parsed:
            tr, ti = apply_pauli(re, im, ops)
            lr = lr + coeff * tr
            li = li + coeff * ti
        grads = {}
        pr, pi = re, im
        for k in range(len(gates) - 1, -1, -1):
            g = gates[k]
            if k in idx_set:
                q = g.qubits[0]
                hi, lo = 1 << (n - 1 - q), 1 << q
                if g.name in ("rz", "p"):
                    # -2 Im <lambda| P1 |psi_k>
                    zr, zi = inner(lr.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                   li.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                   pr.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                   pi.reshape(hi, 2, lo)[:, 1, :].ravel())
                    grads[k] = -2.0 * zi
                else:
                    ax = "X" if g.name == "rx" else "Y"
                    xr, xi = apply_pauli(pr, pi, {q: ax})
                    zr, zi = inner(lr, li, xr, xi)
                    grads[k] = zi          # Im <lambda| {X,Y} |psi_k>
            # undo gate k on both vectors
            if g.name == "cx":
                pr, pi = apply_cnot(pr, pi, g.qubits[0], g.qubits[1], n)
                lr, li = apply_cnot(lr, li, g.qubits[0], g.qubits[1], n)
            else:
                u = matrix_1q(g.name, g.params).conj().T
                ur = jnp.asarray(u.real, real_dtype)
                ui = jnp.asarray(u.imag, real_dtype)
                pr, pi = apply_1q(pr, pi, ur, ui, g.qubits[0], n)
                lr, li = apply_1q(lr, li, ur, ui, g.qubits[0], n)
        return jnp.stack([grads[i] for i in idxs]) if idxs else jnp.zeros(0)

    grads = np.asarray(jax.jit(backward)(re, im), dtype=np.float64)
    return grads, idxs


def make_adjoint_value_and_grad(
    circuit: Circuit,
    terms,
    config: Optional[SimulatorConfig] = None,
    tie=None,
    _raw: bool = False,
    _value_only: bool = False,
):
    """Compile ONE jitted ``f(thetas) -> (<H>, grads)`` for optimizer loops.

    The rotation parameters of ``circuit`` become a traced input vector
    (order = the returned ``idxs``), so a VQE/QAOA optimizer iterates with
    ZERO recompilation: forward applies every gate inside the jit
    (parameterized matrices built from ``thetas`` with jnp ops, fixed
    gates baked as constants), then the adjoint sweep of
    ``adjoint_gradient`` runs in the same program.  Returns
    ``(fn, idxs, theta0)`` with ``theta0`` = the circuit's current values.

    ``tie`` shares one traced parameter across many gates (the QAOA
    pattern: every edge's rz carries the same gamma): a mapping
    ``{gate_index: (slot, scale)}`` meaning gate k's angle is
    ``scale * thetas[slot]``.  Gradients apply the chain rule — slot s
    accumulates ``scale_k * dE/dangle_k`` over its gates — so one adjoint
    sweep yields exact d<H>/dgamma_l, d<H>/dbeta_l for a p-layer QAOA.
    With ``tie``, rotation gates NOT in the map stay constant, ``theta0``
    is slot-indexed (read off the first gate carrying each slot), and the
    returned ``idxs`` lists the tied gate indices.
    """
    import jax
    import jax.numpy as jnp

    from .ir.gates import matrix_1q
    from .observables import _parse_pauli, apply_pauli_parts, inner_parts
    from .ops.apply import apply_1q, apply_cnot, initial_state_parts

    cfg = config or SimulatorConfig()
    real_dtype = jnp.float64 if cfg.dtype == "complex128" else jnp.float32
    n = circuit.num_qubits
    if tie is None:
        idxs = parameterized_gates(circuit)
        pos_of = {g: (j, 1.0) for j, g in enumerate(idxs)}
        num_slots = len(idxs)
        theta0 = np.array([circuit.gates[i].params[0] for i in idxs])
    else:
        pos_of = {}
        for k, (slot, scale) in tie.items():
            g = circuit.gates[k]
            if g.name not in SHIFT_RULE_GATES or not g.params:
                raise ValueError(
                    f"tied gate {k} ({g.name!r}) has no adjoint rule")
            if float(scale) == 0.0:
                raise ValueError(f"tied gate {k} has zero scale")
            pos_of[int(k)] = (int(slot), float(scale))
        idxs = sorted(pos_of)
        slots = {s for s, _ in pos_of.values()}
        num_slots = 1 + max(slots) if slots else 0
        if slots != set(range(num_slots)):
            raise ValueError(f"tie slots {sorted(slots)} are not contiguous")
        theta0 = np.zeros(num_slots)
        seen = set()
        for k in idxs:
            s, sc = pos_of[k]
            if s not in seen:
                seen.add(s)
                theta0[s] = circuit.gates[k].params[0] / sc
    gates = list(circuit.gates)
    parsed = [(float(c), _parse_pauli(p, n)) for c, p in terms]

    def mat_1q(name, theta, dagger=False):
        """(ur, ui) as jnp arrays; theta traced for the rotation family."""
        s = -1.0 if dagger else 1.0
        ct, st = jnp.cos(theta / 2), jnp.sin(theta / 2)
        if name in ("rz", "p"):
            c1, s1 = jnp.cos(theta), jnp.sin(theta)
            ur = jnp.array([[1.0, 0.0], [0.0, 0.0]], real_dtype) \
                + c1 * jnp.array([[0.0, 0.0], [0.0, 1.0]], real_dtype)
            ui = s * s1 * jnp.array([[0.0, 0.0], [0.0, 1.0]], real_dtype)
            return ur, ui
        if name == "rx":
            ur = ct * jnp.eye(2, dtype=real_dtype)
            ui = -s * st * jnp.array([[0.0, 1.0], [1.0, 0.0]], real_dtype)
            return ur, ui
        if name == "ry":
            ur = (ct * jnp.eye(2, dtype=real_dtype)
                  + s * st * jnp.array([[0.0, -1.0], [1.0, 0.0]], real_dtype))
            return ur, jnp.zeros((2, 2), real_dtype)
        raise AssertionError(name)  # fixed gates take the constant path

    def mat_fixed(g, dagger=False):
        u = matrix_1q(g.name, g.params)
        if dagger:
            u = u.conj().T
        return (jnp.asarray(u.real, real_dtype),
                jnp.asarray(u.imag, real_dtype))

    def apply_pauli(re, im, ops):
        return apply_pauli_parts(re, im, ops, n)

    inner = inner_parts

    def fn(thetas):
        thetas = jnp.asarray(thetas, real_dtype)
        pr, pi = initial_state_parts(n, dtype=real_dtype)
        for k, g in enumerate(gates):
            if g.name == "cx":
                pr, pi = apply_cnot(pr, pi, g.qubits[0], g.qubits[1], n)
                continue
            if k in pos_of:
                s, sc = pos_of[k]
                ur, ui = mat_1q(g.name, sc * thetas[s])
            else:
                ur, ui = mat_fixed(g)
            pr, pi = apply_1q(pr, pi, ur, ui, g.qubits[0], n)
        lr = jnp.zeros_like(pr)
        li = jnp.zeros_like(pi)
        for coeff, ops in parsed:
            tr, ti = apply_pauli(pr, pi, ops)
            lr = lr + coeff * tr
            li = li + coeff * ti
        energy, _ = inner(pr, pi, lr, li)
        if _value_only:
            return energy, jnp.zeros(0, real_dtype)
        grads = [jnp.zeros((), real_dtype)] * num_slots
        for k in range(len(gates) - 1, -1, -1):
            g = gates[k]
            if k in pos_of:
                s, sc = pos_of[k]
                q = g.qubits[0]
                hi, lo = 1 << (n - 1 - q), 1 << q
                if g.name in ("rz", "p"):
                    _, zi = inner(lr.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                  li.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                  pr.reshape(hi, 2, lo)[:, 1, :].ravel(),
                                  pi.reshape(hi, 2, lo)[:, 1, :].ravel())
                    grads[s] = grads[s] + sc * (-2.0 * zi)
                else:
                    ax = "X" if g.name == "rx" else "Y"
                    xr, xi = apply_pauli(pr, pi, {q: ax})
                    _, zi = inner(lr, li, xr, xi)
                    grads[s] = grads[s] + sc * zi
            if g.name == "cx":
                pr, pi = apply_cnot(pr, pi, g.qubits[0], g.qubits[1], n)
                lr, li = apply_cnot(lr, li, g.qubits[0], g.qubits[1], n)
                continue
            if k in pos_of:
                s, sc = pos_of[k]
                ur, ui = mat_1q(g.name, sc * thetas[s], dagger=True)
            else:
                ur, ui = mat_fixed(g, dagger=True)
            pr, pi = apply_1q(pr, pi, ur, ui, g.qubits[0], n)
            lr, li = apply_1q(lr, li, ur, ui, g.qubits[0], n)
        gvec = (jnp.stack(grads) if num_slots
                else jnp.zeros(0, real_dtype))
        return energy, gvec

    if _raw:
        return fn, idxs, theta0
    return jax.jit(fn), idxs, theta0


def run_vqe(
    circuit: Circuit,
    terms,
    steps: int = 100,
    learning_rate: float = 0.05,
    optimizer=None,
    tie=None,
    maximize: bool = False,
    config: Optional[SimulatorConfig] = None,
    restarts: int = 0,
    spread: float = 0.5,
    seed: int = 0,
):
    """Run a whole variational optimization ON DEVICE: ONE jitted program
    scans ``steps`` adam updates, each an adjoint value-and-grad sweep.

    Per-step host round-trips disappear — over a high-latency link (the
    axon tunnel RTTs every dispatch) this turns N steps x RTT into one
    dispatch + one fetch.  ``optimizer``: any optax GradientTransformation
    (default ``optax.adam(learning_rate)``); ``maximize=True`` ascends
    (QAOA's <C>).  Returns ``(theta_final, energies)`` with ``energies``
    the per-step values BEFORE each update (host numpy, fetched once).

    ``restarts=K`` vmaps the ENTIRE optimization over K initial points
    (the circuit's own angles plus K-1 uniform perturbations of width
    ``spread``) and keeps the best final energy — parallel restarts
    against local minima at the cost of K states resident, with the K
    adjoint sweeps batched onto the MXU as one program.
    """
    import jax
    import jax.numpy as jnp
    import optax

    fn, idxs, theta0 = make_adjoint_value_and_grad(
        circuit, terms, config=config, tie=tie, _raw=True)
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    sign = -1.0 if maximize else 1.0

    def step(carry, _):
        theta, opt_state = carry
        e, g = fn(theta)
        upd, opt_state = opt.update(sign * g, opt_state, theta)
        return (optax.apply_updates(theta, upd), opt_state), e

    def drive(theta):
        init = (theta, opt.init(theta))
        (theta, _), es = jax.lax.scan(step, init, None, length=steps)
        e_final, _ = fn(theta)
        return theta, es, e_final

    if restarts and restarts > 1:
        rng = np.random.default_rng(seed)
        inits = np.tile(np.asarray(theta0), (restarts, 1))
        inits[1:] += rng.uniform(-spread, spread,
                                 size=(restarts - 1, len(theta0)))
        thetas, ess, finals = jax.jit(jax.vmap(drive))(jnp.asarray(inits))
        finals = np.asarray(finals)
        best = int(np.argmax(finals) if maximize else np.argmin(finals))
        return np.asarray(thetas[best]), np.asarray(ess[best])

    theta, energies, _ = jax.jit(drive)(jnp.asarray(theta0))
    return np.asarray(theta), np.asarray(energies)


def energy_landscape(
    circuit: Circuit,
    terms,
    thetas,
    tie=None,
    config: Optional[SimulatorConfig] = None,
    max_batch_log2: int = 24,
) -> np.ndarray:
    """<H> over a (G, P) grid of parameter vectors, vmapped on device.

    Forward passes only (no adjoint sweep); chunked so a batch never
    exceeds 2^max_batch_log2 amplitudes.  The QAOA p=1 (gamma, beta)
    heatmap in two lines:

        g, b = np.meshgrid(gs, bs, indexing="ij")
        E = energy_landscape(c, cost, np.stack([g, b], -1).reshape(-1, 2),
                             tie=tie).reshape(g.shape)
    """
    import jax
    import jax.numpy as jnp

    fn, idxs, _ = make_adjoint_value_and_grad(
        circuit, terms, config=config, tie=tie, _raw=True, _value_only=True)
    thetas = np.asarray(thetas, dtype=float)
    if thetas.ndim != 2:
        raise ValueError(f"thetas must be (grid, params), got {thetas.shape}")

    @jax.jit
    def batch(ts):
        return jax.vmap(lambda t: fn(t)[0])(ts)

    n = circuit.num_qubits
    per = max(1, 1 << max(0, max_batch_log2 - n))
    out = []
    for lo in range(0, thetas.shape[0], per):
        out.append(np.asarray(batch(jnp.asarray(thetas[lo:lo + per]))))
    return np.concatenate(out)
