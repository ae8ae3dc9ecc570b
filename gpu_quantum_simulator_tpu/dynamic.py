"""Dynamic circuits: mid-circuit measurement, reset, classical control.

The reference's measurement support is a disabled end-of-circuit sampling
loop (quantum_simulator.c:68-73, 256-283); mid-circuit measurement does not
exist there.  This module adds the full dynamic-circuit model on top of the
static engines: a ``DynamicCircuit`` is a program of unitary segments
interleaved with measurements, resets, and classically-controlled gates,
executed as Born-rule trajectories.

Execution strategy: unitary segments run through any ``Simulator`` strategy
(each segment is a plain ``Circuit``; with ``strategy='prefetch'`` repeated
trajectories reuse every compiled executable AND the per-segment program
cache, so extra shots cost only device execution).  Measurements collapse
the device-resident state in one fused pass (sampling.measure_qubit_device)
— the 2^n amplitudes never leave the device.
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
    # depends on runtime clbits).
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

    results: List[TrajectoryResult] = []
    for _ in range(shots):
        re, im = initial_state_parts(n, dtype=real_dtype)
        clbits = [0] * dc.num_clbits

        def run_segment(circ, re, im):
            state = join_state(np.asarray(re), np.asarray(im))
            re, im, _ = sim.run_device(circ, initial=state)
            return re, im

        for kind, seg in segments:
            if kind == "circuit":
                re, im = run_segment(seg, re, im)
                continue
            if isinstance(seg, Measure):
                re, im, out = measure_qubit_device(
                    re, im, seg.qubit, float(rng.random()))
                clbits[seg.clbit] = out
            elif isinstance(seg, Reset):
                re, im, out = measure_qubit_device(
                    re, im, seg.qubit, float(rng.random()))
                if out == 1:
                    flip = Circuit(n)
                    flip.x(seg.qubit)
                    re, im = run_segment(flip, re, im)
            elif isinstance(seg, CondGate):
                if clbits[seg.clbit] == seg.value:
                    one = Circuit(n)
                    one.gates.append(seg.gate)
                    re, im = run_segment(one, re, im)
            else:  # pragma: no cover
                raise AssertionError(seg)
        state = None
        if return_states:
            state = join_state(np.asarray(re), np.asarray(im))
        results.append(TrajectoryResult(state, tuple(clbits)))
    return results
