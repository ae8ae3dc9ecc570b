from .apply import (
    apply_1q,
    apply_2q,
    apply_cnot,
    apply_kq,
    initial_state_parts,
    join_state,
    split_state,
)

__all__ = [
    "apply_1q",
    "apply_2q",
    "apply_cnot",
    "apply_kq",
    "initial_state_parts",
    "join_state",
    "split_state",
]
