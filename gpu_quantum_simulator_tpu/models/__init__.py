from .circuits import (
    grover,
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
    "bell",
    "ghz",
    "qft",
    "random_circuit",
    "grover_like",
    "GROVER_3_18_PROFILE",
    "load_reference_circuit",
]
