"""Composite-gate decompositions into the native set {1q matrices, cx}.

Engines never see these names — the front-end lowers them here, so every
strategy (including the fused/MXU paths) gets them for free.

The parameterized family follows the standard qelib1.inc bodies EXACTLY
(including global phase: every identity is written in terms of
u1 = diag(1, e^{i lambda}) — the repo's rz/p convention — and the standard
u3, so lowering a qiskit-exported circuit reproduces its amplitudes
bit-for-bit, not merely up to phase).  Pinned by
tests/test_parser.py::test_composite_matrices_exact.
"""

from __future__ import annotations

import math

from .circuit import Circuit

# name -> (arity, number of parameters)
COMPOSITE_GATES = {
    "cz": (2, 0), "swap": (2, 0), "ccx": (3, 0), "ccz": (3, 0),
    "cy": (2, 0), "ch": (2, 0), "cswap": (3, 0),
    "u1": (1, 1), "u2": (1, 2), "u3": (1, 3),
    "crz": (2, 1), "cp": (2, 1), "cu1": (2, 1), "cu3": (2, 3),
    "crx": (2, 1), "cry": (2, 1),
    "rzz": (2, 1), "rxx": (2, 1),
}


def emit_cz(c: Circuit, a: int, b: int) -> None:
    c.h(b)
    c.cx(a, b)
    c.h(b)


def emit_swap(c: Circuit, a: int, b: int) -> None:
    c.cx(a, b)
    c.cx(b, a)
    c.cx(a, b)


def emit_ccz(c: Circuit, a: int, b: int, t: int) -> None:
    """Standard T-depth CCZ (no Hadamard conjugation)."""
    c.cx(b, t)
    c.tdg(t)
    c.cx(a, t)
    c.t(t)
    c.cx(b, t)
    c.tdg(t)
    c.cx(a, t)
    c.t(b)
    c.t(t)
    c.cx(a, b)
    c.tdg(b)
    c.cx(a, b)
    c.t(a)


def emit_ccx(c: Circuit, a: int, b: int, t: int) -> None:
    c.h(t)
    emit_ccz(c, a, b, t)
    c.h(t)


def emit_cy(c: Circuit, a: int, b: int) -> None:
    c.sdg(b)
    c.cx(a, b)
    c.s(b)


def emit_ch(c: Circuit, a: int, b: int) -> None:
    # H = Ry(pi/4) Z Ry(-pi/4) (both are reflections), so controlled-H
    # conjugates an exact CZ — no global-phase slack anywhere.  Circuit
    # order is left-to-right: apply Ry(-pi/4) first.
    c.ry(-math.pi / 4, b)
    emit_cz(c, a, b)
    c.ry(math.pi / 4, b)


def emit_cswap(c: Circuit, ctl: int, a: int, b: int) -> None:
    c.cx(b, a)
    emit_ccx(c, ctl, a, b)
    c.cx(b, a)


def _u1(c: Circuit, lam: float, q: int) -> None:
    c.append("p", q, params=(lam,))


def _u3(c: Circuit, theta: float, phi: float, lam: float, q: int) -> None:
    c.append("u", q, params=(theta, phi, lam))


def emit_composite(c: Circuit, name: str, qubits, params=()) -> None:
    arity, nparams = COMPOSITE_GATES[name]
    if len(qubits) != arity or len(set(qubits)) != arity:
        raise ValueError(f"{name} expects {arity} distinct qubits")
    if len(params) != nparams:
        raise ValueError(f"{name} expects {nparams} parameter(s), "
                         f"got {len(params)}")
    if name == "cz":
        emit_cz(c, *qubits)
    elif name == "swap":
        emit_swap(c, *qubits)
    elif name == "ccx":
        emit_ccx(c, *qubits)
    elif name == "ccz":
        emit_ccz(c, *qubits)
    elif name == "cy":
        emit_cy(c, *qubits)
    elif name == "ch":
        emit_ch(c, *qubits)
    elif name == "cswap":
        emit_cswap(c, *qubits)
    elif name == "u1":
        _u1(c, params[0], qubits[0])
    elif name == "u2":
        _u3(c, math.pi / 2, params[0], params[1], qubits[0])
    elif name == "u3":
        _u3(c, *params, qubits[0])
    elif name == "crz":
        (lam,), (a, b) = params, qubits
        _u1(c, lam / 2, b)
        c.cx(a, b)
        _u1(c, -lam / 2, b)
        c.cx(a, b)
    elif name in ("cp", "cu1"):
        (lam,), (a, b) = params, qubits
        _u1(c, lam / 2, a)
        c.cx(a, b)
        _u1(c, -lam / 2, b)
        c.cx(a, b)
        _u1(c, lam / 2, b)
    elif name == "cu3":
        (theta, phi, lam), (a, b) = params, qubits
        _u1(c, (lam + phi) / 2, a)
        _u1(c, (lam - phi) / 2, b)
        c.cx(a, b)
        _u3(c, -theta / 2, 0.0, -(phi + lam) / 2, b)
        c.cx(a, b)
        _u3(c, theta / 2, phi, 0.0, b)
    elif name == "crx":
        (lam,), (a, b) = params, qubits
        _u1(c, math.pi / 2, b)
        c.cx(a, b)
        _u3(c, -lam / 2, 0.0, 0.0, b)
        c.cx(a, b)
        _u3(c, lam / 2, -math.pi / 2, 0.0, b)
    elif name == "cry":
        (lam,), (a, b) = params, qubits
        _u3(c, lam / 2, 0.0, 0.0, b)
        c.cx(a, b)
        _u3(c, -lam / 2, 0.0, 0.0, b)
        c.cx(a, b)
    elif name == "rzz":
        (theta,), (a, b) = params, qubits
        c.cx(a, b)
        _u1(c, theta, b)
        c.cx(a, b)
    elif name == "rxx":
        (theta,), (a, b) = params, qubits
        _u3(c, math.pi / 2, theta, 0.0, a)
        c.h(b)
        c.cx(a, b)
        _u1(c, -theta, b)
        c.cx(a, b)
        c.h(b)
        c.append("u", a, params=(math.pi / 2, -math.pi, math.pi - theta))
    else:  # pragma: no cover
        raise ValueError(name)


def zyz_angles(u):
    """(theta, phi, lam, gamma) with u = e^{i gamma} * u3(theta, phi, lam).

    The controlled-gate lowering for ARBITRARY 1q unitaries (QASM3
    ``ctrl @``): controlled-u = p(gamma) on the control (the phase fires
    exactly when the control is 1) followed by cu3(theta, phi, lam)."""
    import cmath

    import numpy as np

    u = np.asarray(u, dtype=complex)
    a, b, c_, d = u[0, 0], u[0, 1], u[1, 0], u[1, 1]
    theta = 2.0 * math.atan2(abs(c_), abs(a))
    if abs(a) < 1e-12:              # theta = pi: top-left column vanishes
        gamma = cmath.phase(c_)
        phi = 0.0
        lam = cmath.phase(-b) - gamma
    elif abs(c_) < 1e-12:           # theta = 0: diagonal
        gamma = cmath.phase(a)
        phi = 0.0
        lam = cmath.phase(d) - gamma
    else:
        gamma = cmath.phase(a)
        phi = cmath.phase(c_) - gamma
        lam = cmath.phase(-b) - gamma
    return theta, phi, lam, gamma
