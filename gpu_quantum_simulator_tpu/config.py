"""Simulator configuration.

The reference selects its optimization strategy by compiling a different
binary (nine programs, SURVEY §2.1) and tunes via compile-time #defines
(NUMTHREAD/NUMBLOCKS/MAX_COSTANT, quantum_simulator_preproces_constant.cu:27-32).
Here every ablation is a config on one library.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# "auto" precision resolves to the 3-pass "high" rung from this width up:
# sampling-class scale (the Simulator samples device-side past n=22), where
# the measured 2x MXU-pass saving (n=29 76.7 -> 63.0 s flat, n=30 136.5 ->
# 109.9 s in-place, bench_artifacts/precision_ab.json / inplace_knob_ab.json)
# buys far more than the ~4e-7 circuit-level amplitude error costs — an
# order of magnitude inside the BASELINE.md 1e-6 parity bar.  Below it,
# exact-f32 "highest" (the reference-parity rung) stays the default.
PRECISION_AUTO_HIGH_MIN_QUBITS = 24


def resolve_precision(precision: str, num_qubits: int) -> str:
    """Materialize the "auto" precision rung for a circuit width.

    Every engine resolves through here before building (and before keying
    any plan/kernel cache), so auto and the equivalent explicit setting
    share compiled programs.
    """
    if precision != "auto":
        return precision
    return ("high" if num_qubits >= PRECISION_AUTO_HIGH_MIN_QUBITS
            else "highest")


STRATEGIES = (
    "auto",        # width-based dispatch over the measured single-chip ladder
                   # (prefetch <= 22, mxu 23..28, prefetch in-place >= 29;
                   # sharded when a mesh is configured) — engine.simulator
    "reference",   # NumPy complex128 ground truth (quantum_simulator.c semantics)
    "naive",       # one jitted device call per gate (ref: naive launch-per-gate)
    "fused2x2",    # host-side per-qubit 2x2 accumulation (ref: preproces)
    "fused3in1",   # flush+flush+CNOT in one dispatch (ref: preproces_3in1, debugged)
    "fused4x4",    # pair state machine -> 4x4 blocks (ref: 4x4, its fastest)
    "megakernel",  # whole fused op-list unrolled into ONE jit (ref: constant/texture)
    "scan",        # recompile-free lax.scan over dense gate tables
    "mxu",         # k-qubit fusion to 128x128 blocks on the MXU (TPU-native flagship)
    "prefetch",    # recompile-free: one Pallas kernel per (n, cap), runtime op tables
    "pallas",      # mxu pipeline with hand-written Pallas kernels (Karatsuba matmul)
    "vmem",        # whole circuit inside chunked Pallas kernels, state VMEM-resident (n<=19)
    "sharded",     # mesh-sharded state vector, all_to_all qubit swaps
)


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    strategy: str = "mxu"
    # complex64 (split float32, like the GPU variants) or complex128 (like the
    # CPU reference; TPU executes f64 slowly — intended for parity checking).
    dtype: str = "complex64"
    # qubit-relabeling pass (correct version of ref's permute variants);
    # output is always returned in the ORIGINAL basis (ref defect #7 avoided).
    permute: bool = False
    # max fused block width for the mxu strategy (7 -> 128x128 matrices).
    max_fused_qubits: int = 7
    # MXU pass precision for f32 matmuls: "highest" (6 bf16 passes — full
    # f32 accuracy), "high" (3 passes, ~2x MXU throughput, ~1e-6 relative
    # error per circuit; fine for sampling workloads) or "auto" (default:
    # "highest" below PRECISION_AUTO_HIGH_MIN_QUBITS qubits, "high" from
    # there up — the measured n>=24 win, resolve_precision above).
    precision: str = "auto"
    # scan strategy pads op tables to the next multiple of this bucket size so
    # circuits of similar depth share one compiled executable.
    scan_bucket: int = 256
    # commutation-window size for the fusion emitter (None = per-strategy
    # default: prefetch 8, others 1).  Wider windows pack more gates per
    # fused block by absorbing ops into older blocks past disjoint newer ones.
    fusion_window: Optional[int] = None
    # kh-cost-aware fusion (None = per-strategy default).  Splits the
    # low/high width caps and picks absorb candidates by predicted
    # wide-engine block cost (utils.roofline.kh_block_costs).
    fusion_cost_model: Optional[bool] = None
    # prefetch commutation-aware op scheduling (fewer cross-tile swap
    # boundaries at n >= 23).  None = automatic (on).
    prefetch_reorder: Optional[bool] = None
    # prefetch in-place (aliased) execution: the state's own buffers are
    # reused by every kernel, halving peak HBM (required from n=30 on one
    # 16 GB chip).  None = automatic (n >= 30).
    prefetch_inplace: Optional[bool] = None
    # prefetch fusion high-qubit cap (None = default 2; the offline plan
    # model favors 1 at n >= 24) and per-block mat-table capacity class
    # (None = 4 at n >= 21 flat, else engine CAP_MATS).  Env overrides
    # QSIM_PREFETCH_MAX_HIGH / QSIM_PREFETCH_CAP_MATS apply when unset —
    # the on-chip A/B hook for plan_model --tune candidates.
    prefetch_max_high: Optional[int] = None
    prefetch_cap_mats: Optional[int] = None
    # sharding: number of global (mesh-sharded) qubits; None = auto from mesh.
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axis_names: Tuple[str, ...] = ("amp",)
    # segmented sharded execution (parallel/sharded_prefetch.py): chunked
    # recompile-free scan chains instead of one monolithic shard_map unroll.
    # None = automatic (on when >= 9 local qubits and complex64).
    shard_segmented: Optional[bool] = None

    def __post_init__(self):
        if self.strategy not in STRATEGIES:
            raise ValueError(
                f"unknown strategy {self.strategy!r}; pick one of {STRATEGIES}"
            )
        if self.dtype not in ("complex64", "complex128"):
            raise ValueError("dtype must be complex64 or complex128")
        if not (1 <= self.max_fused_qubits <= 10):
            raise ValueError("max_fused_qubits must be in [1, 10]")
        if self.precision not in ("auto", "highest", "high", "default"):
            raise ValueError("precision must be auto/highest/high/default")

    def effective_precision(self, num_qubits: int) -> str:
        """The concrete MXU precision rung for a circuit of this width."""
        return resolve_precision(self.precision, num_qubits)
