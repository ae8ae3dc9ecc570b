from .cpu import simulate_reference, apply_gate_numpy, cumulative_distribution, sample
from .stabilizer import (StabilizerState, is_clifford_circuit,
                         random_clifford_circuit)

__all__ = [
    "simulate_reference",
    "apply_gate_numpy",
    "cumulative_distribution",
    "sample",
    "StabilizerState",
    "is_clifford_circuit",
    "random_clifford_circuit",
]
