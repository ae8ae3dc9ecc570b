"""Dynamic circuits: mid-circuit measurement, reset, classical control.

The reference's measurement support is a disabled end-of-circuit sampling
loop (quantum_simulator.c:68-73, 256-283); mid-circuit measurement does not
exist there.  This module adds the full dynamic-circuit model on top of the
static engines: a ``DynamicCircuit`` is a program of unitary segments
interleaved with measurements, resets, and classically-controlled gates,
executed as Born-rule trajectories.

Execution strategy: unitary segments run through the Simulator's
layout-closed program path (``run_device_parts``) — each segment is a plain
``Circuit`` compiled once and replayed from the program caches, consuming
and producing DEVICE-resident (re, im) parts.  Measurements collapse the
state in one fused pass (sampling.measure_qubit_device).  The 2^n
amplitudes never cross the device boundary during a trajectory; only the
1-bit measurement outcomes do (and, with ``return_states=True``, one final
state fetch per shot).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Tuple, Union

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit, Gate


@dataclass(frozen=True)
class Measure:
    qubit: int
    clbit: int


@dataclass(frozen=True)
class Reset:
    qubit: int


@dataclass(frozen=True)
class CondGate:
    """Apply ``gate`` iff classical bit ``clbit`` equals ``value``."""

    gate: Gate
    clbit: int
    value: int = 1


Item = Union[Gate, Measure, Reset, CondGate]


@dataclass
class DynamicCircuit:
    """An n-qubit circuit with measurements and classical control flow."""

    num_qubits: int
    num_clbits: int = 0
    items: List[Item] = field(default_factory=list)

    def _check_q(self, q: int) -> None:
        if not (0 <= q < self.num_qubits):
            raise ValueError(f"qubit {q} outside [0, {self.num_qubits})")

    def _check_c(self, c: int) -> None:
        if not (0 <= c < self.num_clbits):
            raise ValueError(f"clbit {c} outside [0, {self.num_clbits})")

    def append(self, name: str, *qubits: int, params: Iterable[float] = ()):
        g = Gate(name, tuple(qubits), tuple(params))
        for q in g.qubits:
            self._check_q(q)
        self.items.append(g)
        return self

    _GATE_HELPERS = frozenset(
        {"h", "x", "sx", "z", "s", "sdg", "t", "tdg", "rz", "cx"})

    def __getattr__(self, name):
        # delegate gate helpers (h/x/cx/rz/...) to append, mirroring Circuit
        if name in DynamicCircuit._GATE_HELPERS:
            def helper(*args, **kwargs):
                probe = Circuit(self.num_qubits)
                getattr(probe, name)(*args, **kwargs)
                self.items.extend(probe.gates)
                return self

            return helper
        raise AttributeError(name)

    def measure(self, qubit: int, clbit: int):
        self._check_q(qubit)
        self._check_c(clbit)
        self.items.append(Measure(qubit, clbit))
        return self

    def reset(self, qubit: int):
        self._check_q(qubit)
        self.items.append(Reset(qubit))
        return self

    def c_if(self, clbit: int, name: str, *qubits: int,
             params: Iterable[float] = (), value: int = 1):
        self._check_c(clbit)
        g = Gate(name, tuple(qubits), tuple(params))
        for q in g.qubits:
            self._check_q(q)
        self.items.append(CondGate(g, clbit, value))
        return self


@dataclass
class TrajectoryResult:
    state: Optional[np.ndarray]      # final amplitudes (None if not requested)
    clbits: Tuple[int, ...]          # classical register after the run


def run_dynamic(
    dc: DynamicCircuit,
    config: Optional[SimulatorConfig] = None,
    shots: int = 1,
    seed: int = 0,
    return_states: bool = False,
) -> List[TrajectoryResult]:
    """Execute ``shots`` Born-rule trajectories of a dynamic circuit.

    Each trajectory replays the program; unitary segments are served from
    the Simulator's program caches so repeated shots re-execute without any
    re-planning or re-compilation.
    """
    import jax
    import jax.numpy as jnp

    from .engine.simulator import Simulator
    from .ops.apply import initial_state_parts, join_state
    from .sampling import measure_qubit_device

    cfg = config or SimulatorConfig()
    sim = Simulator(cfg)
    n = dc.num_qubits
    rng = np.random.default_rng(seed)
    real_dtype = jnp.float64 if cfg.dtype == "complex128" else jnp.float32

    # Pre-split the program into maximal unitary segments (shared by all
    # trajectories; conditional gates split segments because their presence
    # depends on runtime clbits).  Per-item helper circuits (reset flips,
    # conditional gates) are built ONCE so every shot hits the same
    # program-cache entries.
    segments: List[Tuple[str, object]] = []   # ("circuit", Circuit) | item
    cur = Circuit(n)
    for item in dc.items:
        if isinstance(item, Gate):
            cur.gates.append(item)
            continue
        if cur.gates:
            segments.append(("circuit", cur))
            cur = Circuit(n)
        segments.append(("item", item))
    if cur.gates:
        segments.append(("circuit", cur))
    flip_for: dict = {}
    cond_for: dict = {}
    for kind, seg in segments:
        if kind == "item" and isinstance(seg, Reset):
            flip = Circuit(n)
            flip.x(seg.qubit)
            flip_for[seg.qubit] = flip
        elif kind == "item" and isinstance(seg, CondGate):
            one = Circuit(n)
            one.gates.append(seg.gate)
            cond_for[id(seg)] = one

    results: List[TrajectoryResult] = []
    for _ in range(shots):
        re, im = initial_state_parts(n, dtype=real_dtype)
        clbits = [0] * dc.num_clbits

        for kind, seg in segments:
            # device-resident throughout: unitary segments run through the
            # layout-closed program path (Simulator.run_device_parts), so
            # the 2^n amplitudes never cross the device boundary — only
            # the 1-bit measurement outcomes do
            if kind == "circuit":
                re, im, _ = sim.run_device_parts(seg, (re, im))
                continue
            if isinstance(seg, Measure):
                re, im, out = measure_qubit_device(
                    re, im, seg.qubit, float(rng.random()))
                clbits[seg.clbit] = out
            elif isinstance(seg, Reset):
                re, im, out = measure_qubit_device(
                    re, im, seg.qubit, float(rng.random()))
                if out == 1:
                    re, im, _ = sim.run_device_parts(
                        flip_for[seg.qubit], (re, im))
            elif isinstance(seg, CondGate):
                if clbits[seg.clbit] == seg.value:
                    re, im, _ = sim.run_device_parts(
                        cond_for[id(seg)], (re, im))
            else:  # pragma: no cover
                raise AssertionError(seg)
        state = None
        if return_states:
            state = join_state(np.asarray(re), np.asarray(im))
        results.append(TrajectoryResult(state, tuple(clbits)))
    return results
