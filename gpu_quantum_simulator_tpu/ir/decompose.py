"""Composite-gate decompositions into the native set {1q matrices, cx}.

Engines never see these names — the front-end lowers them here, so every
strategy (including the fused/MXU paths) gets them for free.
"""

from __future__ import annotations

from .circuit import Circuit

COMPOSITE_GATES = ("cz", "swap", "ccx", "ccz")


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


def emit_composite(c: Circuit, name: str, qubits) -> None:
    if name == "cz":
        emit_cz(c, *qubits)
    elif name == "swap":
        emit_swap(c, *qubits)
    elif name == "ccx":
        emit_ccx(c, *qubits)
    elif name == "ccz":
        emit_ccz(c, *qubits)
    else:  # pragma: no cover
        raise ValueError(name)
