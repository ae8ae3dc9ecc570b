"""Roofline accounting for circuit programs.

The reference's performance story is an arithmetic-intensity argument
(Slides.pptx slide 14: 2x2 kernel = 3.5 FLOP/B, 4x4 = 7.5 FLOP/B).  This
module generalizes that accounting to fused op-lists so benchmarks can
report achieved fraction of the hardware roofline (BASELINE.md's >=80%
target).

Chip numbers default to TPU v5e (one core): 819 GB/s HBM, ~197 TFLOP/s
bf16 MXU; float32 matmuls at precision='highest' use 6 bf16 passes
(~33 TFLOP/s effective).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12
F32_HIGHEST_FLOPS = V5E_BF16_FLOPS / 6.0


@dataclass
class CostModel:
    flops: float
    hbm_bytes: float

    def seconds(self, peak_flops=F32_HIGHEST_FLOPS, hbm_bw=V5E_HBM_BYTES_PER_S):
        """Roofline lower bound: max of compute time and memory time."""
        return max(self.flops / peak_flops, self.hbm_bytes / hbm_bw)

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.hbm_bytes, 1.0)


def wide_program_cost(ops: Sequence, num_qubits: int, lane_qubits: int = 7) -> CostModel:
    """FLOPs + HBM bytes of the wide-matmul program (engine/wide.py).

    Per op: state read+write (2 arrays x 2 passes x 4 B x 2^n) plus the
    D x D matrix pair; 4 real matmuls of (2^n / D, D) @ (D, D).
    """
    n = num_qubits
    state_elems = 1 << n
    flops = 0.0
    bytes_ = 0.0
    for op in ops:
        kh = sum(1 for q in op.qubits if q >= lane_qubits)
        D = (1 << kh) * (1 << lane_qubits)
        flops += 4 * 2 * state_elems * D          # 4 real matmuls
        bytes_ += 4 * 4 * state_elems             # r/w of both arrays, f32
        bytes_ += 2 * 4 * D * D                   # matrix pair
    return CostModel(flops, bytes_)


# Measured per-block wall-clock by kh class (ms) from the scan-timing
# harness on the real v5e chip (_tpu_b.py; table in docs/PERFORMANCE.md).
# Two regimes: sub-HBM working sets run compute-bound (cost ~ 2^kh, n=20
# anchor) while large states are bandwidth-bound (flat-ish, n=24 anchor).
_KH_COSTS_COMPUTE_BOUND = (0.0214, 0.0468, 0.1028)   # measured @ n=20
_KH_COSTS_HBM_BOUND = (0.863, 1.014, 1.767)          # measured @ n=24


def kh_block_costs(num_qubits: int) -> tuple:
    """Calibrated per-block cost by kh class for the wide engine.

    Used by the fusion emitter's cost model (csrc/qsim_fuse.cpp push):
    only the RATIOS matter, so the anchor closest to the requested state
    size is returned un-rescaled.
    """
    return (_KH_COSTS_COMPUTE_BOUND if num_qubits <= 21
            else _KH_COSTS_HBM_BOUND)


def reference_gate_cost(num_gates_1q: int, num_cx: int, num_qubits: int) -> CostModel:
    """Unfused gate-by-gate cost (the reference naive variant's accounting:
    28 FLOP / 8 B per 2x2 butterfly pair, slide 14)."""
    n = num_qubits
    pairs = 1 << (n - 1)
    return CostModel(
        flops=28.0 * pairs * num_gates_1q,
        hbm_bytes=8.0 * 2 * pairs * (num_gates_1q + num_cx),
    )
