from .cpu import simulate_reference, apply_gate_numpy, cumulative_distribution, sample

__all__ = [
    "simulate_reference",
    "apply_gate_numpy",
    "cumulative_distribution",
    "sample",
]
