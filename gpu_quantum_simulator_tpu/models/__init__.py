from .circuits import (
    grover,
    grover_parts,
    bell,
    ghz,
    qft,
    random_circuit,
    grover_like,
    GROVER_3_18_PROFILE,
    load_reference_circuit,
)

__all__ = [
    "grover",
    "grover_parts",
    "bell",
    "ghz",
    "qft",
    "random_circuit",
    "grover_like",
    "GROVER_3_18_PROFILE",
    "load_reference_circuit",
]
