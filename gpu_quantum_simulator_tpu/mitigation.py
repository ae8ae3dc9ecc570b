"""Zero-noise extrapolation (ZNE) over the trajectory noise stack.

Error mitigation for noisy expectation values — a capability the CUDA
reference (pure states only, quantum_simulator.c) has no analog of, and
the natural consumer of two existing pieces:

* **Unitary folding** (:func:`folded`) scales the effective noise by an
  odd integer c: the circuit becomes C (C^dagger C)^((c-1)/2) — the same
  unitary, c times the gates, hence ~c times the per-gate noise.  Exact
  by ``Circuit.inverse`` (the gate set is dagger-closed).
* **Trajectory ensembles** (``dynamic.expectation_noisy``) evaluate each
  folded circuit under the per-gate noise model as ONE batched device
  ensemble with shared seeds across scales (common-random-numbers
  variance reduction on the extrapolation differences).

:func:`zne_expectation` fits a polynomial in the scale and reads off the
value at c = 0.  With order=1 (default) this is classic Richardson/linear
ZNE; order=len(scales)-1 gives full Richardson extrapolation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .config import SimulatorConfig
from .ir.circuit import Circuit


def folded(circuit: Circuit, scale: int) -> Circuit:
    """Global unitary folding: C -> C (C^dagger C)^((scale-1)/2).

    ``scale`` must be a positive odd integer; the returned circuit
    implements the SAME unitary with ``scale``x the gate count, so a
    per-gate noise model acts ~``scale``x as often."""
    scale = int(scale)
    if scale < 1 or scale % 2 == 0:
        raise ValueError(f"fold scale must be a positive odd integer, "
                         f"got {scale}")
    out = Circuit(circuit.num_qubits, list(circuit.gates))
    inv = circuit.inverse()
    for _ in range((scale - 1) // 2):
        out.gates.extend(inv.gates)
        out.gates.extend(circuit.gates)
    return out


def zne_expectation(
    circuit: Circuit,
    terms,
    shots: int = 2048,
    kind: str = "depolarizing",
    p1: float = 0.0,
    p2: float = 0.0,
    seed: int = 0,
    scales: Sequence[int] = (1, 3, 5),
    order: int = 1,
    config: Optional[SimulatorConfig] = None,
    return_fits: bool = False,
):
    """Zero-noise-extrapolated <H> under a per-gate noise model.

    Evaluates ``expectation_noisy`` on the circuit folded at each scale
    (same seed: shared noise realizations) and extrapolates the values
    to scale 0 with a degree-``order`` polynomial fit.  Returns the
    mitigated float, or ``(value, scales, raw_values)`` when
    ``return_fits`` — the raw ladder is the honesty check.
    """
    from .dynamic import expectation_noisy

    scales = [int(c) for c in scales]
    if len(scales) < order + 1:
        raise ValueError(
            f"need at least order+1 = {order + 1} scales, got {len(scales)}")
    values = []
    for c in scales:
        fc = folded(circuit, c)
        values.append(expectation_noisy(
            fc, terms, shots=shots, kind=kind, p1=p1, p2=p2, seed=seed,
            config=config))
    coeffs = np.polyfit(np.asarray(scales, dtype=float),
                        np.asarray(values, dtype=float), order)
    value = float(np.polyval(coeffs, 0.0))
    if return_fits:
        return value, list(scales), [float(v) for v in values]
    return value
