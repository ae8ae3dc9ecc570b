"""Prefetch engine: recompile-free execution from runtime op tables.

The reference's only recompile-free design is the constant-memory re-upload
loop: one fixed kernel, new gate tables uploaded per round
(quantum_simulator_preproces_constant_only.cu:312-340).  Its first XLA
analog here (engine/scan.py) pays ~100x for dynamic per-amplitude gathers.
This engine is that idea at MXU speed — compiled ONCE per (n, capacity,
depth-bucket), never per circuit:

* State pair: (R2, 256) float32, R2 = 2^(n-8).  The low 7 qubits are lanes,
  qubit 7 the column-half bit: qubits 0..7 form the MATMUL WINDOW on which
  any gate block is a dense 256x256 matrix applied as ``rows @ M^T`` per
  row tile — one MXU contraction (two tiles) per fused op.
* One Pallas kernel call executes a BLOCK of up to ``CAP_STEPS`` steps per
  state round-trip: the state streams through VMEM in (T, 256) tiles and
  the whole step list runs on each tile.  A step (SMEM-scalar encoded) is
    - ``mat``:   multiply by runtime table slot midx[j] (VMEM-resident),
    - ``tswap``: exchange qubit 7 with qubit 7+k, k <= log2 T — the pair
      lives INSIDE the tile, a pure VMEM shuffle, no HBM traffic,
    - ``perm``:  exchange lane qubit v with qubit 7 — a 256x256 0/1 matrix
      from a PROCESS-WIDE constant table (7 matrices, uploaded once ever).
* Swaps with qubits ABOVE the tile span ride the next block's input DMA:
  the input index map (scalar-prefetch driven) reads each (T, 128) column
  half through the swap permutation, so even the coldest-qubit swaps cost
  zero extra passes and zero extra dispatches.
* The whole circuit executes as lax.scan chains over stacked block tables
  (greedy power-of-2 chunks), so a 2445-gate circuit is a handful of
  dispatches and every executable is reused by ANY later circuit at the
  same width — the TPU-scale version of re-uploading ``__constant__``
  tables, with none of the reference's 1927-op ceiling.

The planner is the corrected generalization of the reference's relabeling
histogram (quantum_simulator_preproces_permute.cu:388-413; defects #5-#7
fixed): exact remaining-use victim choice, and — via ``final_layout`` —
the plan itself routes the state back to the ORIGINAL qubit basis with
near-free in-plan steps, so no device unpermute pass ever runs.

Complex multiply is the 3-matmul Karatsuba form; tables ship as
(M_re^T, M_im^T) and the two combinations are formed on the VPU in-kernel
(65K adds vs 33M MACs per op-tile), keeping H2D at 512 KB per op.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ir.oplist import Op, op_matrix

LANE_QUBITS = 7
LANES = 1 << LANE_QUBITS
LOCAL_QUBITS = 8              # matmul window: lanes + the column-half qubit 7
DVIEW = 1 << LOCAL_QUBITS     # 256
TILE_ROWS = 512               # state rows of 256 per grid step
RELAYOUT_TILE_ROWS = 64       # relayout kernel block rows (exposes row bits
                              # >= log2 of this as steerable grid bits)
CAP_STEPS = 48                # steps (mats + tswaps + perms) per block
CAP_MATS = 12                 # 2 tables x 12 x 256 KB = 6 MB VMEM
MIN_QUBITS = 9                # below this the megakernel path is used
RELAYOUT_SLOTS = 24           # scal tail slots reserved for a FOLDED relayout
                              # sigma (scal mode 5): enough for every exposed
                              # row-block bit at n = 30 with Tr = 64 (16) and
                              # the shrunken-tile test geometries
# relayout parking looks this many topological waves past the ready set
# when filling spare park slots (the plan portfolio tries several depths
# and keeps the model-cheapest plan, so this is only the fallback depth)
LOOKAHEAD_WAVES = int(os.environ.get("QSIM_LOOKAHEAD_WAVES", "1"))
# candidate lookahead depths for the plan portfolio ("" = off); planning
# costs ~40-60 ms per candidate, so the portfolio only runs where device
# time dwarfs it (PrefetchProgram gates it at n >= PORTFOLIO_MIN_QUBITS)
PLAN_PORTFOLIO = tuple(
    int(w) for w in os.environ.get("QSIM_PLAN_PORTFOLIO", "1,3,6").split(",")
    if w.strip())
PORTFOLIO_MIN_QUBITS = 23


def tile_rows(n: int) -> int:
    return min(TILE_ROWS, 1 << (n - LOCAL_QUBITS))


def relayout_rows(n: int) -> int:
    return min(RELAYOUT_TILE_ROWS, 1 << (n - LOCAL_QUBITS))


_WINDOW_CACHE: dict = {}
_EXPAND_CACHE: dict = {}


def _window_vectors(positions: Tuple[int, ...]) -> Tuple[np.ndarray, np.ndarray]:
    """(m, h) int32[256]: window index -> factor index / untouched-bit key.

    m(i) = sum_j bit_{positions[j]}(i) << j; h(i) packs the remaining window
    bits.  The embedded matrix is M[i1, i2] = u[m(i1), m(i2)] * (h(i1) ==
    h(i2)); unsorted ``positions`` fold the basis reordering in for free.
    """
    got = _WINDOW_CACHE.get(positions)
    if got is not None:
        return got
    idx = np.arange(DVIEW)
    m = np.zeros(DVIEW, dtype=np.int32)
    used = 0
    for j, p in enumerate(positions):
        m |= (((idx >> p) & 1) << j).astype(np.int32)
        used |= 1 << p
    h = np.zeros(DVIEW, dtype=np.int32)
    shift = 0
    for p in range(LOCAL_QUBITS):
        if not (used >> p) & 1:
            h |= (((idx >> p) & 1) << shift).astype(np.int32)
            shift += 1
    if len(_WINDOW_CACHE) > 4096:
        _WINDOW_CACHE.clear()
    _WINDOW_CACHE[positions] = (m, h)
    return m, h


def _expand_index(positions: Tuple[int, ...]):
    """(flat gather index, float mask) for host-side embedding."""
    got = _EXPAND_CACHE.get(positions)
    if got is not None:
        return got
    m, h = _window_vectors(positions)
    dim = 1 << len(positions)
    # transposed embedding: out_T[i2, i1] = u[m(i1), m(i2)]
    flat = (m[None, :].astype(np.int64) * dim + m[:, None]).astype(np.int32)
    mask = (h[:, None] == h[None, :]).astype(np.float32)
    if len(_EXPAND_CACHE) > 512:
        _EXPAND_CACHE.clear()
    _EXPAND_CACHE[positions] = (flat, mask)
    return flat, mask


def _expand_local_into(
    u: np.ndarray, positions: Sequence[int], out_re: np.ndarray, out_im: np.ndarray
) -> None:
    """Write (M_re^T, M_im^T) of ``u`` embedded in the 8-bit window into
    preallocated float32 views (host-side twin of the device expansion in
    ``_get_expander``; used by tests and small programs).

    Vectorized replacement for expand_unitary+permute_basis (whose rank-16
    reshapes copied ~1 MB/op and dominated planning): with
    m(i) = sum_j bit_{positions[j]}(i) << j and h(i) the remaining bits,
    M[i1, i2] = u[m(i1), m(i2)] * (h(i1) == h(i2)).  ``positions`` may be
    unsorted — that folds the basis reordering in for free.
    """
    flat, mask = _expand_index(tuple(positions))
    ur = np.ascontiguousarray(u.real, dtype=out_re.dtype)
    ui = np.ascontiguousarray(u.imag, dtype=out_im.dtype)
    np.take(ur.ravel(), flat, out=out_re)
    out_re *= mask
    np.take(ui.ravel(), flat, out=out_im)
    out_im *= mask


_EXPANDER_CACHE: dict = {}
UPAD = 128  # factor matrices ship padded to (128, 128); m indexes 128-stride

_MONO_CACHE: dict = {}


def _monomial_phases(u: np.ndarray) -> Optional[np.ndarray]:
    """Row phases if ``u`` is MONOMIAL (a generalized permutation matrix:
    exactly one unit-modulus entry per row and column), else None.

    The grover-profile gate mix is dominated by cx/x/rz compositions, and
    ~3/4 of FUSED ops stay monomial: u[r, sigma(r)] = e^{i theta_r}.  Such
    an op needs no 3-matmul Karatsuba product — one 0/1-pattern matmul per
    component gathers the columns, and the phase rotation is a VPU
    broadcast multiply (the ``mono`` kernel step, ~2/3 the MXU work).
    Returns theta[r] (zeros on padding rows).
    """
    key = id(u)   # planner reuses op matrices; cheap memo by identity
    got = _MONO_CACHE.get(key)
    if got is not None and got[0] is u:
        return got[1]
    az = np.abs(u)
    nz = az > 1e-12
    ok = ((nz.sum(axis=0) == 1).all() and (nz.sum(axis=1) == 1).all()
          and np.allclose(az[nz], 1.0, rtol=0, atol=1e-12))
    if ok:
        rows, cols = np.nonzero(nz)
        theta = np.zeros(u.shape[0])
        theta[rows] = np.angle(u[rows, cols])
    else:
        theta = None
    if len(_MONO_CACHE) > 4096:
        _MONO_CACHE.clear()
    _MONO_CACHE[key] = (u, theta)
    return theta


def _get_expander(C: int, cap: int, real_dtype):
    """Device-side table expansion: (C, cap, 128, 128) factors + (C, cap,
    256) index/equivalence vectors -> (C, cap, 256, 256) transposed tables.

    Tables ship over the (slow) host link as compact factors — a width-7 op
    is 2x64 KB instead of 2x256 KB, and the 256x256 writes happen at HBM
    bandwidth on device instead of on the host: out_T[w, v] =
    u[mo(v), mi(w)] * (ho(v) == hi(w)).

    The input- and output-side index vectors are SEPARATE: a perm step
    emitted directly after a mat (the victim rotation between ops) is folded
    into that mat as an output-window relabeling — (mo, ho) are the mat's
    (m, h) composed with the folded permutation, and the standalone perm
    matmul pass vanishes (plan_prefetch add_perm).

    MONOMIAL slots (mono[b, s] = 1): ``u_re`` ships the 0/1 pattern and
    ``u_im`` zeros, so the a-table is the pure gather matrix; the phase
    rotation vectors cos/sin(theta[mo(v)]) ride ROWS 0 and 1 of the
    otherwise-unused b-table (``phases`` ships compact (cap, 2, 128) rows).
    """
    dt = np.dtype(real_dtype)
    key = (C, cap, dt.str)
    fn = _EXPANDER_CACHE.get(key)
    if fn is not None:
        return fn

    hi = jax.lax.Precision.HIGHEST  # 0/1 selections: exact in f32 only then

    @jax.jit
    def expand(u_re, u_im, mvec_i, hvec_i, mvec_o, hvec_o, phases, mono):
        rng = jnp.arange(UPAD, dtype=mvec_i.dtype)
        sel_i = (mvec_i[..., :, None] == rng).astype(dt)
        sel_o = (mvec_o[..., :, None] == rng).astype(dt)
        mask = (hvec_o[..., None, :] == hvec_i[..., :, None]).astype(dt)

        def one(u):
            # out_T[w, v] = u[mo(v), mi(w)]
            #            = sum_{k,l} sel_i[w,k] u[l,k] sel_o[v,l]
            t = jnp.einsum("bswk,bslk->bswl", sel_i, u, precision=hi)
            t = jnp.einsum("bswl,bsvl->bswv", t, sel_o, precision=hi)
            return t * mask

        a = one(u_re)
        b = one(u_im)
        # phase-rotation rows for mono slots: row[v] = phases[., mo(v)]
        pc = jnp.einsum("bsvl,bsl->bsv", sel_o, phases[..., 0, :], precision=hi)
        ps = jnp.einsum("bsvl,bsl->bsv", sel_o, phases[..., 1, :], precision=hi)
        bm = jnp.zeros_like(b)
        bm = bm.at[..., 0, :].set(pc)
        bm = bm.at[..., 1, :].set(ps)
        b = jnp.where((mono != 0)[..., None, None], bm, b)
        return a, b

    _EXPANDER_CACHE[key] = expand
    return expand


# debug/ablation knob: fold perm steps into the preceding mat's tables
PERM_FOLD = True
# Lower MONOMIAL ops as generic 3-matmul mat steps instead of the
# 2-matmul + VPU-rotation mono step.  The mono step's measured marginal
# cost (~1.3 ms/pass, kernel_micro_n24) EXCEEDS the full Karatsuba mat
# step (~0.65 ms/pass) despite doing one matmul less — the dynamic
# cos/sin row slices + broadcast rotation do not pipeline the way
# back-to-back MXU dots do.  On-chip A/B (knob_ab.log 2026-08-19,
# grover_like workload): n=24 18.91 -> 12.27 s alone, 11.06 s with
# window=16 + cap_mats=8; n=26 neutral (91.3 -> 90.5 s).  Tri-state:
# None = auto (on for flat plans at n >= MONO_AUTO_MIN_QUBITS, where it
# was measured); QSIM_MONO_AS_MAT / assigning a bool forces either arm.
_MONO_ENV = os.environ.get("QSIM_MONO_AS_MAT")
MONO_AS_MAT = None if _MONO_ENV is None else bool(int(_MONO_ENV))
MONO_AUTO_MIN_QUBITS = 21
# in-place (split-halves) plans: only n=30 is measured (inplace_knob_ab);
# forced-in-place tests at small n keep the mono step.
MONO_INPLACE_AUTO_MIN_QUBITS = 29


def resolve_mono_as_mat(n: int, inplace: bool = False,
                        num_global: int = 0) -> bool:
    """Effective mono-as-mat lowering for one plan.  Auto scope = exactly
    the measured regimes: single-chip flat plans at n >= 21 (knob_ab
    2026-08-19: n=24 18.9 -> 12.3 s) and in-place halves chains at
    n >= MONO_INPLACE_AUTO_MIN_QUBITS (inplace_knob_ab n30knobs arm
    2026-08-19: 156.9/166.9 default -> 136.5 s warm with knobs).
    Sharded plans stay on the mono step until their own A/B says
    otherwise."""
    if MONO_AS_MAT is not None:
        return bool(MONO_AS_MAT)
    if num_global != 0:
        return False
    if inplace:
        return n >= MONO_INPLACE_AUTO_MIN_QUBITS
    return n >= MONO_AUTO_MIN_QUBITS


# A/B knob: lower UNFOLDED lane-victim perm steps (window bit v <-> 7
# exchange) as a 2-qubit SWAP mat slot on positions (v, 7) instead of the
# dedicated p_ref dot-pair step.  MEASURED NEGATIVE on chip (knob_ab.log
# 2026-08-19): n=24 mono+perm 17.57 s / mono+perm+w16+cm8 22.60 s vs
# mono-only 12.27 s — the extra mats slots fragment blocks faster than
# the cheaper step kind pays back.  Stays default-off; kept as the
# documented ablation hook (docs/ABLATIONS.md).
PERM_AS_MAT = bool(int(os.environ.get("QSIM_PERM_AS_MAT", "0")))
_SWAP4 = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex)
# debug/ablation knob: parallel grid dimension on the block kernel
_PARALLEL_GRID = True

_WSWAP_CACHE: dict = {}


def _window_swap_index(v: int) -> np.ndarray:
    """Index map sigma over window indices exchanging bits v and 7:
    applying a perm step to window state s yields s'[w] = s[sigma(w)]."""
    s = _WSWAP_CACHE.get(v)
    if s is None:
        idx = np.arange(DVIEW)
        bv, b7 = (idx >> v) & 1, (idx >> LANE_QUBITS) & 1
        s = ((idx & ~((1 << v) | (1 << LANE_QUBITS)))
             | (b7 << v) | (bv << LANE_QUBITS)).astype(np.int32)
        _WSWAP_CACHE[v] = s
    return s


def _perm_matrix_256(a: int, b: int) -> np.ndarray:
    """0/1 matrix exchanging bits a and b of the window index (symmetric)."""
    idx = np.arange(DVIEW)
    ba, bb = (idx >> a) & 1, (idx >> b) & 1
    swapped = (idx & ~((1 << a) | (1 << b))) | (bb << a) | (ba << b)
    m = np.zeros((DVIEW, DVIEW), dtype=np.float32)
    m[swapped, idx] = 1.0
    return m


_PERM_TABLE: dict = {}


def perm_table(real_dtype) -> jnp.ndarray:
    """(7, 256, 256) lane<->qubit-7 exchange matrices; one H2D per process."""
    dt = np.dtype(real_dtype)
    tab = _PERM_TABLE.get(dt.str)
    if tab is None:
        tab = jnp.asarray(
            np.stack([_perm_matrix_256(v, LANE_QUBITS) for v in range(LANE_QUBITS)]),
            dtype=dt,
        )
        _PERM_TABLE[dt.str] = tab
    return tab


# --------------------------------------------------------------------- plan
@dataclass
class _Block:
    kinds: List[int] = field(default_factory=list)   # 0 mat, 1..logt tswap, logt+1 perm
    midx: List[int] = field(default_factory=list)    # mat slot / perm lane
    # deferred matrix specs (u, window positions, output perm | None);
    # expanded straight into the stacked device tables at materialization
    # time; the output perm is the composition of perm steps folded into
    # this mat's output-window relabeling (see _get_expander)
    mats: List[Tuple[np.ndarray, Tuple[int, ...], Optional[np.ndarray]]] = (
        field(default_factory=list))
    # pending cross-tile swap applied to this block's INPUT: (tmask, shift)
    prologue: Optional[Tuple[int, int]] = None
    # standalone multi-qubit relayout entry: sigma over exposed slots
    # (see get_relayout_kernel); a block carrying this has no steps
    relayout: Optional[np.ndarray] = None
    # FOLDED relayout (QSIM_STREAM_RELAYOUT): the same sigma, applied by
    # sourcing THIS block's streamed input copies through the permutation
    # at relayout-tile granularity — no standalone state pass
    relayout_pro: Optional[np.ndarray] = None
    # standalone mesh-bit exchange entry (sharded execution): swap local
    # window bit 7 with mesh-axis bit ``gswap`` via a ppermute half exchange
    gswap: Optional[int] = None


@dataclass
class PrefetchPlan:
    blocks: List[_Block]
    final_position: np.ndarray
    num_ops: int
    num_tswaps: int
    num_xswaps: int
    num_perms: int
    logt: int
    num_relayouts: int = 0
    num_gswaps: int = 0
    num_pfolds: int = 0
    # the mono-lowering arm this plan was emitted under; the table packer
    # (materialize_entries) must mirror it or mono-encoded tables would
    # drop phases on slots the plan recorded as generic mats
    mono_as_mat: bool = False


def _op_dag(ops: Sequence[Op]):
    """Dependency DAG: ops sharing a qubit keep their relative order; ops on
    disjoint qubit sets commute as operators on disjoint tensor factors, so
    any topological order computes the identical state."""
    nops = len(ops)
    succs: List[List[int]] = [[] for _ in range(nops)]
    indeg = [0] * nops
    last_on: dict = {}
    for i, op in enumerate(ops):
        deps = {last_on[q] for q in op.qubits if q in last_on}
        for d in deps:
            succs[d].append(i)
        indeg[i] = len(deps)
        for q in op.qubits:
            last_on[q] = i
    return succs, indeg


def plan_prefetch(
    ops: Sequence[Op],
    num_qubits: int,
    cap_steps: int = CAP_STEPS,
    cap_mats: int = CAP_MATS,
    final_layout: Optional[Sequence[int]] = None,
    reorder: bool = True,
    allow_relayout: bool = True,
    num_global: int = 0,
    involution_relayout: bool = False,
    lookahead_waves: Optional[int] = None,
    mono_as_mat: Optional[bool] = None,
) -> PrefetchPlan:
    """Lower fused ops to uniform kernel blocks.

    ``num_global``: the top ``num_global`` positions are MESH-AXIS bits of a
    sharded state (parallel/sharded_prefetch.py) rather than local state
    bits.  A qubit at a global position is brought to window bit 7 by a
    ``gswap`` entry — on the mesh this executes as a pairwise ppermute
    column-half exchange over ICI, the distributed twin of the cross-tile
    xswap.  All window/tile geometry then refers to the LOCAL qubit count
    ``num_qubits - num_global``.

    Placement: a qubit at position p >= 8 is brought to position 7 by a
    tswap step (p <= 7+log2 T) or by the next block's input-prologue swap.
    If position 7 is pinned by the op itself, a lane victim is freed first
    with a perm step (a 3-cycle: victim -> p, old 7 -> victim, target -> 7).
    Victim = coldest by exact remaining-use count (the corrected reference
    histogram, cf. defect #5).

    ``reorder``: commutation-aware scheduling.  Every cross-tile swap forces
    a block boundary (the swap must ride the NEXT block's input DMA), so in
    emission order each op touching a beyond-reach qubit costs one full HBM
    round-trip — at n >= 23 blocks degenerate to ~1 op.  Ops acting on
    disjoint qubit sets commute exactly, so the planner may pick any op
    whose dependencies (earlier ops sharing a qubit) have been emitted.
    The scheduler drains all ready ops whose qubits are already in reach
    before paying for a new cross-tile swap, and picks the next swap as the
    beyond-reach qubit the most ready ops are waiting on — batching a
    qubit's whole ready set under one swap.

    ``allow_relayout``: when >= 2 cold qubits are demanded at once, emit a
    single multi-qubit relayout pass (get_relayout_kernel) that parks them
    all inside tswap reach — one state round-trip replaces one forced block
    boundary per qubit.  The in-place (aliased) executor runs relayouts as
    disjoint HBM block swaps and so plans with ``involution_relayout=True``.
    """
    n = num_qubits
    if MONO_AS_MAT is not None:          # forced arm (env / A/B scripts)
        mono_as_mat = bool(MONO_AS_MAT)
    elif mono_as_mat is None:
        mono_as_mat = resolve_mono_as_mat(n, involution_relayout, num_global)
    lw = LOOKAHEAD_WAVES if lookahead_waves is None else lookahead_waves
    nl = n - num_global          # local qubits: window + tile + cross-tile
    if nl < MIN_QUBITS:
        raise ValueError(f"prefetch plan needs >= {MIN_QUBITS} local qubits")
    widest = max((op.width for op in ops), default=1)
    if widest > LOCAL_QUBITS:
        raise ValueError(f"op touches {widest} qubits > window {LOCAL_QUBITS}")
    logt = int(np.log2(tile_rows(nl)))
    kind_perm = logt + 1
    kind_mono = logt + 2   # monomial op: one gather matmul + phase rotation

    pos_of = list(range(n))
    qubit_at = list(range(n))
    remaining = np.zeros(n, dtype=np.int64)
    for op in ops:
        for q in op.qubits:
            remaining[q] += 1

    blocks: List[_Block] = [_Block()]
    num_tswaps = num_xswaps = num_perms = num_relayouts = num_gswaps = 0
    num_pfolds = 0

    def cur() -> _Block:
        return blocks[-1]

    def _empty(b: _Block) -> bool:
        return (not b.kinds and b.prologue is None and b.relayout is None
                and b.gswap is None)

    def fresh() -> _Block:
        if _empty(cur()):
            return cur()
        blocks.append(_Block())
        return cur()

    def room(extra_steps: int, extra_mats: int) -> _Block:
        b = cur()
        if (b.relayout is not None or b.gswap is not None
                or len(b.kinds) + extra_steps > cap_steps
                or len(b.mats) + extra_mats > cap_mats):
            b = fresh()
        return b

    def add_mat(u: np.ndarray, positions: Tuple[int, ...]) -> None:
        b = room(1, 1)
        # NOTE: lane-only ops used to run as two 128-wide matmuls (a
        # retired mat128 step kind), but the (T, 256) -> (2T, 128) reshape
        # is a sublane/lane relayout that costs MORE than the halved MXU
        # work (measured 2.53 ms vs 1.99 ms per 64-block chain at n=24,
        # kernel_micro_n24.json) — full-width steps only.  Monomial ops
        # (~3/4 of the grover-profile mix) take the 2-matmul mono step.
        kind = (kind_mono if (not mono_as_mat
                              and _monomial_phases(u) is not None) else 0)
        b.kinds.append(kind)
        b.midx.append(len(b.mats))
        b.mats.append((u, positions, None))

    def _fold_target() -> Optional[_Block]:
        # a perm step commutes backward over relayout entries (row-block
        # bits are disjoint from the window) but NOT over anything touching
        # window bit 7 (tswap / xswap prologue / gswap); if the last real
        # step is a mat, the perm folds into its output relabeling
        for b in reversed(blocks):
            if b.relayout is not None:
                continue
            if (b.gswap is None and b.kinds
                    and b.kinds[-1] in (0, kind_mono)):
                return b
            return None
        return None

    def add_perm(v: int) -> None:
        nonlocal num_perms, num_pfolds
        b = _fold_target() if PERM_FOLD else None
        if b is not None:
            u, pos, operm = b.mats[b.midx[-1]]
            sig = _window_swap_index(v)
            operm = sig if operm is None else operm[sig]
            b.mats[b.midx[-1]] = (u, pos, operm)
            num_pfolds += 1
            return
        if PERM_AS_MAT:
            add_mat(_SWAP4, (v, LANE_QUBITS))
            num_perms += 1
            return
        b = room(1, 0)
        b.kinds.append(kind_perm)
        b.midx.append(v)
        num_perms += 1

    def add_tswap(k: int) -> None:
        nonlocal num_tswaps
        b = room(1, 0)
        b.kinds.append(k)
        b.midx.append(0)
        num_tswaps += 1

    def add_xswap(bit: int) -> None:
        # becomes the NEXT block's input prologue: tile-index XOR on the
        # swapped row bit + column-half steering (see get_block_kernel)
        nonlocal num_xswaps
        b = fresh()
        shift = (bit - 1) - logt
        b.prologue = (1 << shift, shift)
        num_xswaps += 1

    def add_gswap(g: int) -> None:
        # standalone entry: local window bit 7 <-> mesh-axis bit g
        nonlocal num_gswaps
        b = fresh()
        b.gswap = g
        num_gswaps += 1

    def t7(p: int) -> None:
        """Exchange position 7 with position p via ONE planned step."""
        if p < LANE_QUBITS:
            add_perm(p)
        elif p >= nl:
            add_gswap(p - nl)
        elif p - LANE_QUBITS <= logt:
            add_tswap(p - LANE_QUBITS)
        else:
            add_xswap(p - LANE_QUBITS)

    def place(op: Op) -> None:
        qs = op.qubits
        for q in qs:
            p = pos_of[q]
            if p < LOCAL_QUBITS:
                continue
            k = p - LANE_QUBITS  # >= 1
            far = k > logt or p >= nl      # cross-tile or mesh bit
            pinned = qubit_at[LANE_QUBITS] in qs
            # The swap always evicts position 7's occupant to position p.
            # For cross-tile/mesh swaps p is a COLD slot (rarely revisited),
            # so evicting a hot qubit there forces a bounce-back later:
            # rotate the coldest lane occupant into position 7 first (one
            # free in-block perm step) whenever 7 is pinned or holds a
            # hotter qubit than the coldest lane.
            if pinned or far:
                cands = [l for l in range(LANE_QUBITS) if qubit_at[l] not in qs]
                v = min(cands, key=lambda l: (remaining[qubit_at[l]], l))
                if pinned or remaining[qubit_at[v]] < remaining[qubit_at[LANE_QUBITS]]:
                    add_perm(v)
                    x, y = qubit_at[v], qubit_at[LANE_QUBITS]
                    qubit_at[v], qubit_at[LANE_QUBITS] = y, x
                    pos_of[x], pos_of[y] = LANE_QUBITS, v
            t7(p)
            ql = qubit_at[LANE_QUBITS]
            qubit_at[LANE_QUBITS], qubit_at[p] = q, ql
            pos_of[q], pos_of[ql] = LANE_QUBITS, p

        u, sorted_qs = op_matrix(op)
        add_mat(u, tuple(pos_of[q] for q in sorted_qs))
        for q in qs:
            remaining[q] -= 1

    xreach = LANE_QUBITS + logt  # positions <= xreach need no cross-tile swap
    lr = int(np.log2(relayout_rows(nl)))
    m_exposed = max(nl - LOCAL_QUBITS - lr, 0)   # row-block bits only
    # park slots: exposed positions already inside tswap reach — a relayout
    # can drop fresh cold qubits straight into them
    parks = list(range(LOCAL_QUBITS + lr, xreach + 1))
    can_relayout = allow_relayout and len(parks) >= 2 and nl - 1 > xreach

    def eidx(p: int) -> int:
        return p - LOCAL_QUBITS - lr

    def add_relayout(mapping: dict) -> None:
        """One multi-qubit relayout entry; ``mapping`` is a bijection
        position -> position over exposed row-block slots [8+lr, nl-1].

        ``involution_relayout`` (the in-place executor): the pair-swap
        kernel moves data as disjoint block swaps, so each emitted sigma
        must be an involution — a general bijection is split into two
        involutions (any cycle is the product of two reflections)."""
        nonlocal num_relayouts
        sigma = np.arange(m_exposed, dtype=np.int32)
        for pa, pb in mapping.items():
            sigma[eidx(pa)] = eidx(pb)
        if involution_relayout and not np.array_equal(
                sigma[sigma], np.arange(m_exposed)):
            s1 = np.arange(m_exposed, dtype=np.int32)
            s2 = np.arange(m_exposed, dtype=np.int32)
            seen = np.zeros(m_exposed, dtype=bool)
            for c0 in range(m_exposed):
                if seen[c0]:
                    continue
                cyc = [c0]
                seen[c0] = True
                j = int(sigma[c0])
                while j != c0:
                    cyc.append(j)
                    seen[j] = True
                    j = int(sigma[j])
                k = len(cyc)
                for t in range(k):          # reflections: sigma = s2 o s1
                    s1[cyc[t]] = cyc[(-t) % k]
                    s2[cyc[t]] = cyc[(1 - t) % k]
            assert np.array_equal(s2[s1], sigma)
            for s in (s1, s2):
                blk = fresh()
                blk.relayout = s
                num_relayouts += 1
        else:
            blk = fresh()
            blk.relayout = sigma
            num_relayouts += 1
        moved = {pb: qubit_at[pa] for pa, pb in mapping.items()}
        for pb, q in moved.items():
            qubit_at[pb] = q
            pos_of[q] = pb

    if not reorder or (nl - 1 <= xreach and num_global == 0):
        for op in ops:
            place(op)
    else:
        import bisect

        succs, indeg = _op_dag(ops)
        ready = [i for i in range(len(ops)) if indeg[i] == 0]
        while ready:
            # selection: (1) first ready op whose qubits are all in reach;
            # (2) else batch-park the demanded cold qubits in one relayout
            # pass; (3) else the op with the fewest swaps, preferring the
            # most-demanded cold qubit (drains its whole ready set first)
            best = best_key = demand = None
            best_aff = None
            for i in ready:
                cost = sum(1 for q in ops[i].qubits if pos_of[q] > xreach)
                if cost == 0:
                    # window affinity among in-reach ops: each qubit
                    # outside the 8-bit window costs a tswap (and usually
                    # a victim perm) — run the cheapest placements first
                    # so window residents are reused before eviction
                    aff = sum(1 for q in ops[i].qubits
                              if pos_of[q] >= LOCAL_QUBITS)
                    if best_aff is None or aff < best_aff[0]:
                        best_aff = (aff, i)
                        if aff == 0:
                            break
                    continue
                if demand is None:
                    demand = {}
                    for j in ready:
                        for q in ops[j].qubits:
                            if pos_of[q] > xreach:
                                demand[q] = demand.get(q, 0) + 1
                pull = max(demand[q] for q in ops[i].qubits
                           if pos_of[q] > xreach)
                key = (cost, -pull, i)
                if best_key is None or key < best_key:
                    best_key, best = key, i
            if best_aff is not None:   # an in-reach op always wins
                best, best_key = best_aff[1], None
            if best_key is not None and can_relayout:
                # lookahead: ops up to LOOKAHEAD_WAVES topological waves
                # beyond the ready set join the demand pool with priority
                # decaying per wave, so one relayout pass also parks the
                # next waves' cold qubits instead of paying a fresh pass
                # per wave.  Wave d = ops whose every unemitted dependency
                # sits in waves < d (simulated via virtual indegrees).
                look: dict = {}
                ahead = set()
                wave_of = {j: 0 for j in ready}
                cur_wave = list(ready)
                vind: dict = {}
                for d in range(1, lw + 1):
                    nxt = []
                    for j in cur_wave:
                        for s in succs[j]:
                            if s in wave_of:
                                continue
                            left = vind.get(s, indeg[s]) - 1
                            vind[s] = left
                            if left == 0:
                                wave_of[s] = d
                                nxt.append(s)
                    if not nxt:
                        break
                    w = lw + 1 - d
                    for s in nxt:
                        ahead.update(ops[s].qubits)
                        for q in ops[s].qubits:
                            if pos_of[q] > xreach and q not in demand:
                                look[q] = look.get(q, 0) + w
                    cur_wave = nxt
            if best_key is not None and can_relayout and len(demand) >= 2:
                frontier = {q for j in ready for q in ops[j].qubits}
                avail = [p for p in parks
                         if qubit_at[p] not in frontier
                         and qubit_at[p] not in ahead]
                if len(avail) < 2:   # lookahead exclusions too greedy
                    avail = [p for p in parks if qubit_at[p] not in frontier]
                # relayout moves local cross-tile bits only; mesh-bit
                # qubits travel one at a time via gswap entries
                cold = sorted((q for q in demand if pos_of[q] < nl),
                              key=lambda q: (-demand[q], pos_of[q]))
                # TERMINATION: at least one READY-demanded qubit must be
                # parked (cold is ready-first).  A lookahead-only relayout
                # can evict other lookahead qubits (the avail fallback
                # drops the `ahead` exclusion) and cycle park<->evict
                # forever without any ready op ever becoming placeable;
                # requiring ready-cold[0] + the frontier exclusion makes
                # every relayout strictly decrease the ready swap cost.
                have_ready_cold = bool(cold)
                cold += sorted((q for q in look if pos_of[q] < nl),
                               key=lambda q: (-look[q], pos_of[q]))
                k = min(len(cold), len(avail)) if have_ready_cold else 0
                if k >= 2:
                    # evict the least-used park occupants to the cold slots
                    avail.sort(key=lambda p: remaining[qubit_at[p]])
                    mapping = {}
                    for t in range(k):
                        pa, pb = avail[t], pos_of[cold[t]]
                        mapping[pa] = pb
                        mapping[pb] = pa
                    add_relayout(mapping)
                    continue  # reselect: the parked qubits' ops are cheap now
            ready.remove(best)
            place(ops[best])
            for s in succs[best]:
                indeg[s] -= 1
                if indeg[s] == 0:
                    bisect.insort(ready, s)

    if final_layout is not None:
        # Route every qubit to its requested position with in-plan steps —
        # position-transpositions built from the existing gadgets (3 perm
        # steps for lane-lane, 1-3 for lane/window, 3 row swaps for
        # row-row).  A handful of extra near-free blocks replaces the
        # Simulator's generic device unpermute, whose bit-swap chain costs
        # one ~30 ms tunnel dispatch per transposition.
        def transpose_positions(pa: int, pb: int) -> None:
            # transposition (pa, pb) through the position-7 bridge: t7(pa)
            # t7(pb) t7(pa) — or one t7 when either side IS position 7.
            # Covers lane/window/row/cross-tile/mesh positions uniformly.
            if pa > pb:
                pa, pb = pb, pa
            if pa == LANE_QUBITS:
                t7(pb)
            elif pb == LANE_QUBITS:
                t7(pa)
            else:
                t7(pa)
                t7(pb)
                t7(pa)
            qa, qb = qubit_at[pa], qubit_at[pb]
            qubit_at[pa], qubit_at[pb] = qb, qa
            pos_of[qa], pos_of[qb] = pb, pa

        want = [int(p) for p in final_layout]
        if can_relayout:
            # Collapse the restore's cross-tile traffic: ONE relayout pass
            # places every exposed-slot occupant whose target is exposed,
            # and stages beyond-reach occupants bound for hidden slots into
            # park slots (in reach); the transpose loop below then finishes
            # with cheap in-reach steps instead of one xswap boundary per
            # misplaced cold qubit.
            exposed = list(range(LOCAL_QUBITS + lr, nl))
            exposed_set = set(exposed)
            for _ in range(2):
                moves = {}
                for a in exposed:
                    q = qubit_at[a]
                    if want[q] != a and want[q] in exposed_set:
                        moves[a] = want[q]
                taken = set(moves.values())
                free_parks = [p for p in parks
                              if p not in taken and p not in moves]
                for a in exposed:
                    if a in moves or not free_parks:
                        continue
                    q = qubit_at[a]
                    if a > xreach and want[q] != a and want[q] not in exposed_set:
                        moves[a] = free_parks.pop(0)
                if len(moves) < 2:
                    break
                # complete to a bijection over exposed slots, identity-first
                taken = set(moves.values())
                rest_t = {t for t in exposed if t not in taken}
                rest_s = []
                for a in exposed:
                    if a in moves:
                        continue
                    if a in rest_t:
                        moves[a] = a
                        rest_t.remove(a)
                    else:
                        rest_s.append(a)
                for a, t in zip(rest_s, sorted(rest_t)):
                    moves[a] = t
                add_relayout(moves)
        for q in range(n):
            if pos_of[q] != want[q]:
                transpose_positions(pos_of[q], want[q])
        assert [pos_of[q] for q in range(n)] == want

    if _empty(blocks[-1]):
        blocks.pop()
    return PrefetchPlan(
        blocks, np.asarray(pos_of), len(ops), num_tswaps, num_xswaps,
        num_perms, logt, num_relayouts, num_gswaps, num_pfolds,
        mono_as_mat=bool(mono_as_mat),
    )


def plan_prefetch_best(ops, num_qubits, stream: bool = False,
                       **kwargs) -> PrefetchPlan:
    """Portfolio planning: plan once per PLAN_PORTFOLIO lookahead depth and
    keep the plan the calibrated cost model (engine/plancost.py) prices
    cheapest.  The greedy scheduler's relayout/tswap counts respond
    non-monotonically to lookahead depth (measured +-3% across depths at
    n=24..30), so trying a few depths per circuit beats fixing one — the
    ~40-60 ms planning cost per candidate is noise against multi-second
    device time at the widths where the portfolio is enabled."""
    from . import plancost

    if len(PLAN_PORTFOLIO) <= 1:
        waves = PLAN_PORTFOLIO[0] if PLAN_PORTFOLIO else None
        return plan_prefetch(ops, num_qubits, lookahead_waves=waves, **kwargs)
    inplace = bool(kwargs.get("involution_relayout"))
    best = None
    for waves in PLAN_PORTFOLIO:
        plan = plan_prefetch(ops, num_qubits, lookahead_waves=waves, **kwargs)
        secs, _ = plancost.estimate_plan(
            plan, num_qubits, inplace=inplace, stream=stream,
            fold_relayout=resolve_stream_relayout(num_qubits, inplace))
        if best is None or secs < best[0]:
            best = (secs, plan)
    return best[1]


# ------------------------------------------------------------------ kernel
_KERNEL_CACHE: dict = {}
_CHAIN_CACHE: dict = {}


def _precision(name: str):
    # Mosaic lowers only DEFAULT and HIGHEST dots ("Unsupported dot
    # precision: HIGH", precision_ab.log 2026-08-19); XLA's 3-pass bf16
    # "high" rung is emulated explicitly in _make_dot/_make_pdot, so it
    # stays a string sentinel here.
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": "high",
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def _make_dot(prec, dt):
    """``x @ m`` at the requested MXU precision (dense f32 operands).

    ``"high"`` is XLA's 3-pass bf16 decomposition (hi*hi + lo*hi + hi*lo)
    written out by hand because Mosaic has no HIGH dot lowering.  Each
    pass is a dot over bf16-NATIVE operands (the hi split, or the bf16
    residual) with a float32 accumulator — feeding the MXU bf16 directly
    instead of f32 operands it would re-convert per pass (the round-5
    matform A/B showed the mat class scales with per-dot work, so the
    duplicated conversions were real time).  ~16 mantissa bits at half
    the MXU work of HIGHEST (6 passes)."""
    if prec == "high":
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=dt,
                                 precision=jax.lax.Precision.DEFAULT)
        b16 = jnp.bfloat16

        def dot(x, m):
            xh = x.astype(b16)
            mh = m.astype(b16)
            xl = (x - xh.astype(dt)).astype(b16)
            ml = (m - mh.astype(dt)).astype(b16)
            return d(xh, mh) + d(xl, mh) + d(xh, ml)

        return dot
    return lambda x, m: jnp.dot(x, m, preferred_element_type=dt,
                                precision=prec)


def _make_pdot(prec, dt):
    """``x @ p`` for a bf16-exact table p (the 0/1 gather patterns of
    perm/mono steps): the table residual is zero, so ``"high"`` needs
    only 2 passes — the exact hi product plus the activation residual,
    both as bf16-native dots with a float32 accumulator."""
    if prec == "high":
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=dt,
                                 precision=jax.lax.Precision.DEFAULT)
        b16 = jnp.bfloat16

        def dot(x, p):
            xh = x.astype(b16)
            xl = (x - xh.astype(dt)).astype(b16)
            ph = p.astype(b16)
            return d(xh, ph) + d(xl, ph)

        return dot
    return lambda x, p: jnp.dot(x, p, preferred_element_type=dt,
                                precision=prec)


TSWAP_ROLL_MIN_K = 4   # tswap strides >= 2^(k-1) rows run as static rolls
# in-place kernel computes directly on the four column halves (no per-tile
# (T, 256) concat + re-split); flip for A/B against the concat form
_SPLIT_HALVES_NATIVE = True


def _mat_kernel() -> str:
    """Complex mat-step form inside the block kernels (chip A/B:
    kernel_micro_n24*.json ``matform`` rows).

    - ``karatsuba``  — 3 dependent dots + VPU operand combines (the
      round-2 default; fewest MXU MACs but a serial dot→add→dot chain)
    - ``schoolbook`` — 4 independent dots + 2 output adds (4/3 the MACs,
      no inter-dot dependencies, no operand combines)
    - ``block``      — ONE (T, 512) x (512, 512) dot against the real
      2x2 embedding [[a, b], [-b, a]] assembled in VMEM per step (same
      MACs as schoolbook collapsed into a single deep MXU contraction;
      the concat/slice are lane-aligned vreg moves)
    """
    return os.environ.get("QSIM_MAT_KERNEL", "karatsuba")


def _make_mat_step(form, ddot, a_ref, b_ref, scal_ref, cap_steps):
    """mat step on a (T, 256) component pair, selected by ``form``.

    All three compute out_re = s_re @ a - s_im @ b,
    out_im = s_re @ b + s_im @ a for a = M_re^T, b = M_im^T
    (reference convention: rows @ M^T, quantum_simulator_4x4.cu:124-134).
    """
    def idx(j):
        return scal_ref[4 + cap_steps + j]

    if form == "schoolbook":
        def mat_step(j, sre, sim):
            a = a_ref[idx(j)]
            b = b_ref[idx(j)]
            return (ddot(sre, a) - ddot(sim, b),
                    ddot(sre, b) + ddot(sim, a))
    elif form == "block":
        def mat_step(j, sre, sim):
            a = a_ref[idx(j)]
            b = b_ref[idx(j)]
            m = jnp.concatenate(
                [jnp.concatenate([a, b], axis=1),
                 jnp.concatenate([-b, a], axis=1)], axis=0)
            o = ddot(jnp.concatenate([sre, sim], axis=1), m)
            return o[:, :DVIEW], o[:, DVIEW:]
    else:  # karatsuba
        def mat_step(j, sre, sim):
            a = a_ref[idx(j)]
            b = b_ref[idx(j)]
            t1 = ddot(sre + sim, a)
            t2 = ddot(sre, b - a)
            t3 = ddot(sim, a + b)
            return t1 - t3, t1 + t2
    return mat_step


def _steps_loop(scal_ref, a_ref, b_ref, p_ref, sre, sim,
                cap_steps: int, T: int, dt, prec):
    """Shared step interpreter: run the block's step list on one tile."""
    logt = int(np.log2(T))
    ddot = _make_dot(prec, dt)
    pdot = _make_pdot(prec, dt)
    mat_step = _make_mat_step(_mat_kernel(), ddot, a_ref, b_ref,
                              scal_ref, cap_steps)

    def make_tswap(k):
        # exchange column bit 7 (qubit 7) with tile-row bit k-1 (qubit 7+k)
        s = 1 << (k - 1)

        def f_reshape(j, sre, sim):
            def one(x):
                t = x.reshape(T >> k, 2, s, 2, LANES)
                return jnp.swapaxes(t, 1, 3).reshape(T, DVIEW)

            return one(sre), one(sim)

        def f_roll(j, sre, sim):
            # rank-5 swapaxes cost grows with the stride (measured 1.8 ->
            # 7.2 us/grid-step from k=1 to k=9, kernel_micro_n24.json);
            # two STATIC sublane rolls + row-parity selects are
            # stride-independent: pair (r, r+s) with bit k-1 of r clear
            # exchanges h1[r] <-> h0[r+s]
            rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)
            lo = ((rows >> (k - 1)) & 1) == 0

            def one(x):
                x0, x1 = x[:, :LANES], x[:, LANES:]
                up = pltpu.roll(x1, s, 0)       # h1[r] arrives at row r+s
                dn = pltpu.roll(x0, T - s, 0)   # h0[r] arrives at row r-s
                return jnp.concatenate(
                    [jnp.where(lo, x0, up), jnp.where(lo, dn, x1)], axis=1)

            return one(sre), one(sim)

        return f_roll if k >= TSWAP_ROLL_MIN_K else f_reshape

    def perm_step(j, sre, sim):
        # lane-bit v <-> window-bit 7 exchange: one real matmul per
        # component against the process-wide 0/1 table p_tab[v] —
        # exact under precision=highest, and cheaper than the previous
        # two-lane-roll VPU shuffle, whose DYNAMIC shift lowered to a
        # log-shift chain (~8.5 us/grid-step vs ~5.2 for a full
        # Karatsuba mat, kernel_micro_n24.json perm1; a real dot pair
        # is ~2/3 of a mat).  A static-shift lax.switch shuffle is
        # arithmetically cheaper still but blows up the remote Mosaic
        # compile (>17 min at n=18 vs ~3 min).
        p = p_ref[scal_ref[4 + cap_steps + j]]
        dot = lambda x: pdot(x, p)
        return dot(sre), dot(sim)

    def mono_step(j, sre, sim):
        # monomial op (one unit-modulus entry per row/column — cx/x/rz
        # compositions, ~3/4 of the grover-profile fused mix): the a-table
        # is the 0/1 gather pattern, so ONE real matmul per component
        # replaces the 3-product Karatsuba; the phase rotation is a VPU
        # broadcast multiply with cos/sin rows 0/1 of the b-table.
        idx = scal_ref[4 + cap_steps + j]
        p = a_ref[idx]
        c = b_ref[idx, 0:1, :]
        s = b_ref[idx, 1:2, :]
        dot = lambda x: pdot(x, p)
        gr = dot(sre)
        gi = dot(sim)
        return gr * c - gi * s, gr * s + gi * c

    branches = (
        [mat_step] + [make_tswap(k) for k in range(1, logt + 1)]
        + [perm_step, mono_step]
    )

    def step(j, carry):
        sre, sim = carry
        return jax.lax.switch(
            scal_ref[4 + j], [partial(b, j) for b in branches], sre, sim
        )

    return jax.lax.fori_loop(0, scal_ref[0], step, (sre, sim))


def _steps_loop_halves(scal_ref, a_ref, b_ref, p_ref, r0, r1, i0, i1,
                       cap_steps: int, T: int, dt, prec):
    """Step interpreter on SPLIT column halves: the in-place engine's state
    arrives as four (T, 128) tiles, and concatenating them into (T, 256)
    pairs (then re-splitting to write back) is pure VMEM relayout traffic
    on every grid step.  This twin of ``_steps_loop`` keeps the halves
    separate end to end: matmul steps run as blocked 2x2 half-matmuls
    (identical MXU work — a 256-wide MXU contraction is four 128x128
    passes either way), tswaps as static sublane rolls + row-parity
    selects, perms as blocked products against the resident 0/1 table.
    """
    logt = int(np.log2(T))
    _ddot = _make_dot(prec, dt)
    _pdot = _make_pdot(prec, dt)

    def _bdot(d, x0, x1, m):
        # halves of x @ m for 256x256 m: (lo, hi) = x0 @ m[:128] + x1 @ m[128:]
        lo = d(x0, m[:LANES, :LANES]) + d(x1, m[LANES:, :LANES])
        hi = d(x0, m[:LANES, LANES:]) + d(x1, m[LANES:, LANES:])
        return lo, hi

    bdot = partial(_bdot, _ddot)        # dense matrices
    bpdot = partial(_bdot, _pdot)       # bf16-exact 0/1 tables

    _matform = _mat_kernel()

    if _matform == "schoolbook":
        def mat_step(j, r0, r1, i0, i1):
            a = a_ref[scal_ref[4 + cap_steps + j]]  # M_re^T
            b = b_ref[scal_ref[4 + cap_steps + j]]  # M_im^T
            ta = bdot(r0, r1, a)
            tb = bdot(i0, i1, b)
            tc = bdot(r0, r1, b)
            td = bdot(i0, i1, a)
            return (ta[0] - tb[0], ta[1] - tb[1],
                    tc[0] + td[0], tc[1] + td[1])
    elif _matform == "block":
        def mat_step(j, r0, r1, i0, i1):
            a = a_ref[scal_ref[4 + cap_steps + j]]  # M_re^T
            b = b_ref[scal_ref[4 + cap_steps + j]]  # M_im^T
            m = jnp.concatenate(
                [jnp.concatenate([a, b], axis=1),
                 jnp.concatenate([-b, a], axis=1)], axis=0)
            o = _ddot(jnp.concatenate([r0, r1, i0, i1], axis=1), m)
            return (o[:, :LANES], o[:, LANES:DVIEW],
                    o[:, DVIEW:DVIEW + LANES], o[:, DVIEW + LANES:])
    else:  # karatsuba
        def mat_step(j, r0, r1, i0, i1):
            a = a_ref[scal_ref[4 + cap_steps + j]]  # M_re^T
            b = b_ref[scal_ref[4 + cap_steps + j]]  # M_im^T
            ba = b - a
            ab = a + b
            t1 = bdot(r0 + i0, r1 + i1, a)
            t2 = bdot(r0, r1, ba)
            t3 = bdot(i0, i1, ab)
            return (t1[0] - t3[0], t1[1] - t3[1],
                    t1[0] + t2[0], t1[1] + t2[1])

    def make_tswap(k):
        # exchange column bit 7 (the half split) with tile-row bit k-1:
        # pair (r, r+s) with bit k-1 of r clear exchanges h1[r] <-> h0[r+s]
        s = 1 << (k - 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)
        lo = ((rows >> (k - 1)) & 1) == 0

        def f(j, r0, r1, i0, i1):
            def one(x0, x1):
                up = pltpu.roll(x1, s, 0)       # h1[r] arrives at row r+s
                dn = pltpu.roll(x0, T - s, 0)   # h0[r] arrives at row r-s
                return jnp.where(lo, x0, up), jnp.where(lo, dn, x1)

            o0, o1 = one(r0, r1)
            p0, p1 = one(i0, i1)
            return o0, o1, p0, p1

        return f

    def perm_step(j, r0, r1, i0, i1):
        p = p_ref[scal_ref[4 + cap_steps + j]]
        o0, o1 = bpdot(r0, r1, p)
        p0, p1 = bpdot(i0, i1, p)
        return o0, o1, p0, p1

    def mono_step(j, r0, r1, i0, i1):
        # monomial op on halves (see _steps_loop.mono_step): one gather
        # matmul per component + VPU phase rotation from b rows 0/1
        idx = scal_ref[4 + cap_steps + j]
        p = a_ref[idx]
        c0 = b_ref[idx, 0:1, :LANES]
        c1 = b_ref[idx, 0:1, LANES:]
        s0 = b_ref[idx, 1:2, :LANES]
        s1 = b_ref[idx, 1:2, LANES:]
        gr0, gr1 = bpdot(r0, r1, p)
        gi0, gi1 = bpdot(i0, i1, p)
        return (gr0 * c0 - gi0 * s0, gr1 * c1 - gi1 * s1,
                gr0 * s0 + gi0 * c0, gr1 * s1 + gi1 * c1)

    branches = (
        [mat_step] + [make_tswap(k) for k in range(1, logt + 1)]
        + [perm_step, mono_step]
    )

    def step(j, carry):
        return jax.lax.switch(
            scal_ref[4 + j], [partial(b, j) for b in branches], *carry
        )

    return jax.lax.fori_loop(0, scal_ref[0], step, (r0, r1, i0, i1))


def get_block_kernel(n: int, real_dtype, precision: str, interpret: bool,
                     cap_steps: int = CAP_STEPS, cap_mats: int = CAP_MATS):
    """The circuit-independent pallas_call: one block of steps, one state
    round-trip.  Returns f(scal, re, im, a_tab, b_tab, p_tab) -> (re, im)
    on (R2, DVIEW) arrays; ``scal`` = int32[4 + 2*cap_steps]:
    [nsteps, pro_active, pro_tmask, pro_shift, kinds..., midx...].

    TWO executables back the call, selected by ``scal[1]`` at run time:
    the steered form reads the state as four (T, 128) column-half streams
    whose index maps fold the pending cross-tile swap into the input DMA;
    the plain form (no prologue) reads full (T, 256) tiles — half the DMA
    issues and no in-kernel half concatenation, which is most of the
    fixed ~10.4 us/grid-step empty-pass overhead (kernel_micro_n24.json).
    """
    dt = np.dtype(real_dtype)
    key = (n, cap_steps, cap_mats, dt.str, precision, interpret,
           _stream_on(n), _mat_kernel())
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    T = tile_rows(n)
    prec = _precision(precision)

    def kernel(scal_ref, rea_ref, reb_ref, ima_ref, imb_ref,
               a_ref, b_ref, p_ref, ore_ref, oim_ref):
        sre = jnp.concatenate([rea_ref[:], reb_ref[:]], axis=1)
        sim = jnp.concatenate([ima_ref[:], imb_ref[:]], axis=1)
        sre, sim = _steps_loop(scal_ref, a_ref, b_ref, p_ref, sre, sim,
                               cap_steps, T, dt, prec)
        ore_ref[:] = sre
        oim_ref[:] = sim

    def kernel_full(scal_ref, re_ref, im_ref,
                    a_ref, b_ref, p_ref, ore_ref, oim_ref):
        sre, sim = _steps_loop(scal_ref, a_ref, b_ref, p_ref,
                               re_ref[:], im_ref[:], cap_steps, T, dt, prec)
        ore_ref[:] = sre
        oim_ref[:] = sim

    # input index maps: the block's pending cross-tile swap (exchange column
    # bit 7 with tile-index bit `shift`) is folded into which (T, 128)
    # column-half block each stream reads — the swap rides the input DMA.
    def map_half(lo: bool):
        def f(i, scal):
            active = scal[1]
            tmask = scal[2]
            rb = (i >> scal[3]) & 1
            row = jnp.where(active == 1, (i & ~tmask) if lo else (i | tmask), i)
            col = jnp.where(active == 1, rb, 0 if lo else 1)
            return row, col

        return f

    half = lambda lo: pl.BlockSpec((T, LANES), map_half(lo), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T, DVIEW), lambda i, scal: (i, 0), memory_space=pltpu.VMEM)
    tab = lambda m: pl.BlockSpec(
        (m, DVIEW, DVIEW), lambda i, scal: (0, 0, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=3 * 2 * R2 * DVIEW * DVIEW * cap_steps,
        bytes_accessed=dt.itemsize
        * (4 * R2 * DVIEW + 2 * cap_mats * DVIEW * DVIEW),
        transcendentals=0,
    )
    # tiles are independent: a parallel grid dimension lets Mosaic
    # overlap each tile's input DMA with the previous tile's compute
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=(
            ("parallel",) if _PARALLEL_GRID else ("arbitrary",)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R2 // T,),
        in_specs=[half(True), half(False), half(True), half(False),
                  tab(cap_mats), tab(cap_mats), tab(LANE_QUBITS)],
        out_specs=[out_spec, out_spec],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R2, DVIEW), dt)] * 2,
        cost_estimate=cost,
        compiler_params=params,
        interpret=interpret,
    )
    grid_spec_full = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R2 // T,),
        in_specs=[out_spec, out_spec,
                  tab(cap_mats), tab(cap_mats), tab(LANE_QUBITS)],
        out_specs=[out_spec, out_spec],
    )
    call_full = pl.pallas_call(
        kernel_full,
        grid_spec=grid_spec_full,
        out_shape=[jax.ShapeDtypeStruct((R2, DVIEW), dt)] * 2,
        cost_estimate=cost,
        compiler_params=params,
        interpret=interpret,
    )

    if _stream_on(n):
        # the streaming kernel handles ALL forms (steered input copies
        # fold the pending xswap exactly like map_half does; folded
        # relayout input copies source through the sigma)
        fn = get_stream_block_kernel(n, dt, precision, interpret,
                                     cap_steps, cap_mats)
        _KERNEL_CACHE[key] = fn
        return fn

    def fn(scal, re, im, a_tab, b_tab, p_tab):
        def steered(args):
            r, i = args
            return call(scal, r, r, i, i, a_tab, b_tab, p_tab)

        def plain(args):
            r, i = args
            return call_full(scal, r, i, a_tab, b_tab, p_tab)

        return jax.lax.cond(scal[1] == 1, steered, plain, (re, im))

    _KERNEL_CACHE[key] = fn
    return fn


STREAM_TILES = 4     # streaming block kernel: in-flight (T, 256) tiles
# Route plain (no-prologue) blocks through the manual streaming kernel
# instead of the Mosaic-pipelined grid form.  Default off until the DMA
# probe (scripts/dma_probe.py) shows the manual window beating Mosaic's
# revolving buffers on the empty pass.
_STREAM_PLAIN = bool(int(os.environ.get("QSIM_STREAM_PLAIN", "0")))
# Fold standalone relayout passes into the NEXT plain block's streamed
# input copies (scal mode 5; docs/ROADMAP.md design note 1): kills both
# the relayout's own state round-trip AND its forced block boundary, at
# the cost of Tr-granular input DMAs (T/Tr copies per tile per component
# instead of one).  Implies streaming-kernel routing.  Round-3 measured
# it a no-op under the then-default plan shapes; the round-4 knob flips
# (mono-as-mat + window=16 + cap_mats=8 → fewer, fatter blocks) changed
# the calculus: under shipped auto defaults the fold wins exec-to-exec
# at n=24 (1.687 vs 1.802 s) AND n=26 (7.234 vs 7.808 s) — diag24.json
# round 5 — so it now defaults ON for flat plans at n >= 23.  None =
# auto; QSIM_STREAM_RELAYOUT=0/1 (or assigning a bool, as the A/B
# scripts do) forces an arm.
_STREAM_RELAYOUT = (None if os.environ.get("QSIM_STREAM_RELAYOUT") is None
                    else bool(int(os.environ["QSIM_STREAM_RELAYOUT"])))
STREAM_RELAYOUT_MIN_QUBITS = 23


def resolve_stream_relayout(n: int, inplace: bool = False) -> bool:
    """Materialize the relayout-fold default for a plan width."""
    if _STREAM_RELAYOUT is not None:
        return bool(_STREAM_RELAYOUT)
    return (not inplace) and n >= STREAM_RELAYOUT_MIN_QUBITS


def _stream_on(n: int, inplace: bool = False) -> bool:
    """Route flat blocks through the manual streaming DMA kernel."""
    return _STREAM_PLAIN or resolve_stream_relayout(n, inplace)


def get_stream_block_kernel(n: int, real_dtype, precision: str,
                            interpret: bool, cap_steps: int = CAP_STEPS,
                            cap_mats: int = CAP_MATS):
    """Streaming twin of the PLAIN block kernel: grid (1,), state refs in
    ANY memory space, and a manual W-deep window of async copies —
    HBM -> VMEM in-slots, ``_steps_loop`` compute, VMEM out-slots -> HBM —
    software-pipelined so input DMAs run up to W tiles ahead while output
    DMAs drain one compute behind.  Motivation: the Mosaic-pipelined grid
    form pays ~10.4 us of fixed per-grid-step overhead against a 2.6 us
    HBM bound at T=512 (kernel_micro_n24.json empty_pass); the manual
    window controls DMA issue order and depth directly.  Same signature
    and scal encoding as ``get_block_kernel`` INCLUDING the steered
    xswap-prologue form: when scal[1] == 1 the input copies become four
    (T, 128) column-half reads whose source tile/column fold the pending
    cross-tile swap into the stream (the manual twin of the grid form's
    ``map_half`` BlockSpec steering).  scal[1] == 5 is the FOLDED RELAYOUT
    form (QSIM_STREAM_RELAYOUT): the input copies drop to relayout-tile
    granularity — T/Tr reads of (Tr, 256) per tile per component — each
    sourced through the pending row-block permutation sigma stored at
    scal[4 + 2*cap_steps + a] (the standalone relayout pass and its block
    boundary disappear; src_of matches get_relayout_kernel exactly).
    """
    dt = np.dtype(real_dtype)
    key = ("stream", n, cap_steps, cap_mats, dt.str, precision, interpret,
           _mat_kernel())
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    T = tile_rows(n)
    nt = R2 // T
    W = min(STREAM_TILES, nt)
    prec = _precision(precision)
    Tr = relayout_rows(n)
    K = T // Tr                       # relayout blocks per working tile
    mrow = (R2 // Tr - 1).bit_length()  # exposed row-block bits
    has_fold = mrow >= 1              # plans only emit relayouts with
    soff = 4 + 2 * cap_steps          # sigma slot offset in scal

    def kernel(scal_ref, sre, sim, a_ref, b_ref, p_ref, ore, oim,
               bre, bim, cre, cim, isem, osem):
        mode = scal_ref[1]
        active = mode == 1

        def in_plain(t, s):
            return (pltpu.make_async_copy(sre.at[pl.ds(t * T, T), :],
                                          bre.at[s], isem.at[s, 0]),
                    pltpu.make_async_copy(sim.at[pl.ds(t * T, T), :],
                                          bim.at[s], isem.at[s, 1]))

        def in_steered(t, s):
            # pending xswap (column bit 7 <-> tile bit `shift`) rides the
            # input: lo/hi halves of working tile t come from tiles
            # t & ~tmask / t | tmask, column half rb = bit `shift` of t
            tmask = scal_ref[2]
            rb = (t >> scal_ref[3]) & 1
            lo = (t & ~tmask) * T
            hi = (t | tmask) * T
            col = pl.ds(rb * LANES, LANES)
            return (
                pltpu.make_async_copy(sre.at[pl.ds(lo, T), col],
                                      bre.at[s, :, pl.ds(0, LANES)],
                                      isem.at[s, 0]),
                pltpu.make_async_copy(sre.at[pl.ds(hi, T), col],
                                      bre.at[s, :, pl.ds(LANES, LANES)],
                                      isem.at[s, 2]),
                pltpu.make_async_copy(sim.at[pl.ds(lo, T), col],
                                      bim.at[s, :, pl.ds(0, LANES)],
                                      isem.at[s, 1]),
                pltpu.make_async_copy(sim.at[pl.ds(hi, T), col],
                                      bim.at[s, :, pl.ds(LANES, LANES)],
                                      isem.at[s, 3]),
            )

        def in_folded(t, s):
            # folded relayout: working tile t's K relayout blocks each
            # source the (Tr, 256) block j with j_bit[a] = i_bit[sigma(a)]
            # (identical addressing to get_relayout_kernel.src_of); modes
            # are exclusive per block, so sem indices 0..2K-1 are free
            copies = []
            for c in range(K):
                i = t * K + c
                j = jnp.zeros((), jnp.int32)
                for a in range(mrow):
                    j = j | (((i >> scal_ref[soff + a]) & 1) << a)
                copies.append(pltpu.make_async_copy(
                    sre.at[pl.ds(j * Tr, Tr), :],
                    bre.at[s, pl.ds(c * Tr, Tr), :], isem.at[s, 2 * c]))
                copies.append(pltpu.make_async_copy(
                    sim.at[pl.ds(j * Tr, Tr), :],
                    bim.at[s, pl.ds(c * Tr, Tr), :], isem.at[s, 2 * c + 1]))
            return copies

        def _in_dispatch(t, s, go):
            @pl.when(active)
            def _():
                for d in in_steered(t, s):
                    go(d)

            if has_fold:
                folded = mode == 5

                @pl.when(folded)
                def _():
                    for d in in_folded(t, s):
                        go(d)

                @pl.when(jnp.logical_and(jnp.logical_not(active),
                                         jnp.logical_not(folded)))
                def _():
                    for d in in_plain(t, s):
                        go(d)
            else:
                @pl.when(jnp.logical_not(active))
                def _():
                    for d in in_plain(t, s):
                        go(d)

        def start_in(t, s):
            _in_dispatch(t, s, lambda d: d.start())

        def wait_in(t, s):
            _in_dispatch(t, s, lambda d: d.wait())

        def out_d(t, s):
            return (pltpu.make_async_copy(cre.at[s],
                                          ore.at[pl.ds(t * T, T), :],
                                          osem.at[s, 0]),
                    pltpu.make_async_copy(cim.at[s],
                                          oim.at[pl.ds(t * T, T), :],
                                          osem.at[s, 1]))

        def pro(s, _):
            start_in(s, s)
            return _

        jax.lax.fori_loop(0, W, pro, None, unroll=False)

        def body(t, _):
            s = jax.lax.rem(t, W)
            wait_in(t, s)

            @pl.when(t >= W)           # out-slot s frees once out(t-W) lands
            def _():
                for d in out_d(t - W, s):
                    d.wait()

            r, i = _steps_loop(scal_ref, a_ref, b_ref, p_ref,
                               bre[s], bim[s], cap_steps, T, dt, prec)
            cre[s] = r
            cim[s] = i
            for d in out_d(t, s):
                d.start()

            @pl.when(t + W < nt)       # in-slot s free: compute(t) is done
            def _():
                start_in(t + W, s)
            return _

        jax.lax.fori_loop(0, nt, body, None, unroll=False)

        def drain(k, _):
            t = nt - W + k

            @pl.when(t >= 0)
            def _():
                for d in out_d(t, jax.lax.rem(t, W)):
                    d.wait()
            return _

        jax.lax.fori_loop(0, W, drain, None, unroll=False)

    tab = lambda m: pl.BlockSpec((m, DVIEW, DVIEW), lambda i, scal: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
            + [tab(cap_mats), tab(cap_mats), tab(LANE_QUBITS)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=[pltpu.VMEM((W, T, DVIEW), dt)] * 4
            + [pltpu.SemaphoreType.DMA(
                   (W, max(4, 2 * K) if has_fold else 4)),
               pltpu.SemaphoreType.DMA((W, 2))],
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, DVIEW), dt)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * R2 * DVIEW * DVIEW * cap_steps,
            bytes_accessed=dt.itemsize
            * (4 * R2 * DVIEW + 2 * cap_mats * DVIEW * DVIEW),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(scal, re, im, a_tab, b_tab, p_tab):
        return call(scal, re, im, a_tab, b_tab, p_tab)

    _KERNEL_CACHE[key] = fn
    return fn


RELAYOUT_DMA_WINDOW = 16   # in-flight HBM->HBM copies per component


def get_relayout_kernel(n: int, real_dtype, interpret: bool):
    """Multi-qubit cross-tile relayout in ONE state pass (pure DMA).

    The block kernel's input prologue can fold exactly one cross-tile swap
    (qubit 7 <-> one tile bit) into a block boundary, so refreshing k cold
    qubits costs k forced boundaries — the n >= 23 round-trip cliff.  This
    kernel applies an arbitrary permutation of the row-block bits (qubits
    >= 8 + log2 Tr) as direct HBM->HBM sliced async copies of whole
    (Tr, 256) row blocks — no VMEM staging, no per-tile grid overhead; a
    window of in-flight DMAs keeps the copy engines saturated.  One pass
    parks up to |[8+log2 Tr, 7+log2 T]| fresh qubits inside tswap reach —
    the batched generalization of the reference's one-shot relabeling
    (quantum_simulator_preproces_permute.cu:388-413), applied mid-circuit.
    (An earlier steered-BlockSpec form paid ~8 us of grid overhead per
    (64, 128) tile — 25x its bandwidth bound at n=24.)

    scal encoding: scal[1] == 3 flags the entry; scal[4 + a] = sigma(a)
    over row-block-bit indices (slot a = qubit 8 + log2 Tr + a), meaning
    the qubit at exposed slot a moves to exposed slot sigma(a).  Qubit 7
    is NOT relayout-addressable — bit-7 exchanges keep their dedicated
    prologue/xswap gadgets.  Returns f(scal, re, im) -> (re, im) on
    (R2, DVIEW) arrays.
    """
    dt = np.dtype(real_dtype)
    Tr = relayout_rows(n)
    key = ("relayout-dma", n, Tr, dt.str, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    nblk = R2 // Tr
    mrow = (nblk - 1).bit_length()      # exposed row-block bits
    W = min(RELAYOUT_DMA_WINDOW, nblk)

    def kernel(scal_ref, sre_ref, sim_ref, ore_ref, oim_ref, sems):
        def src_of(i):
            # source block j of output block i: j_bit[a] = i_bit[sigma(a)]
            j = jnp.zeros((), jnp.int32)
            for a in range(mrow):
                j = j | (((i >> scal_ref[4 + a]) & 1) << a)
            return j

        def dmas(i, slot):
            j = src_of(i)
            return (
                pltpu.make_async_copy(sre_ref.at[pl.ds(j * Tr, Tr), :],
                                      ore_ref.at[pl.ds(i * Tr, Tr), :],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(sim_ref.at[pl.ds(j * Tr, Tr), :],
                                      oim_ref.at[pl.ds(i * Tr, Tr), :],
                                      sems.at[slot, 1]),
            )

        def body(i, _):
            slot = i % W

            @pl.when(i >= W)
            def _():
                for d in dmas(i - W, slot):
                    d.wait()

            for d in dmas(i, slot):
                d.start()
            return _

        jax.lax.fori_loop(0, nblk, body, None, unroll=False)

        def drain(k, _):
            i = nblk - W + k

            @pl.when(i >= 0)
            def _():
                for d in dmas(i, i % W):
                    d.wait()
            return _

        jax.lax.fori_loop(0, W, drain, None, unroll=False)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA((W, 2))],
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, DVIEW), dt)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=4 * dt.itemsize * R2 * DVIEW,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def fn(scal, re, im):
        return call(scal, re, im)

    _KERNEL_CACHE[key] = fn
    return fn


def get_inplace_relayout_kernel(n: int, real_dtype, interpret: bool):
    """Multi-qubit cross-tile relayout for the ALIASED split-state engine.

    The flat relayout (get_relayout_kernel) copies input -> output, which
    an n >= 30 state cannot afford (no second buffer).  Here sigma is an
    INVOLUTION over the exposed row-block bits (plan_prefetch splits any
    general bijection into two involutions), so the induced block
    permutation partitions into disjoint swap pairs (i, j = P(i)).  Pairs
    execute as windowed 3-phase swaps in the state's own buffers — batch W
    pairs, then (1) stage x[i] into VMEM, (2) x[i] <- x[j] HBM->HBM,
    (3) x[j] <- staged copy — phase barriers keep W*4 copies in flight, so
    throughput is DMA-bandwidth-bound while correctness never needs a
    second state buffer.  Same scal encoding as the flat form (scal[1] == 3,
    scal[4 + a] = sigma(a) over slots a = qubit 8 + log2 Tr + a).

    Returns f(scal, re0, re1, im0, im1) -> the four aliased (R2, 128)
    column-half arrays.
    """
    dt = np.dtype(real_dtype)
    Tr = relayout_rows(n)
    key = ("relayout-inplace", n, Tr, dt.str, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    nblk = R2 // Tr
    mrow = (nblk - 1).bit_length()      # exposed row-block bits
    W = max(1, min(RELAYOUT_DMA_WINDOW, nblk // 2))

    def kernel(scal_ref, i0, i1, i2, i3, o0, o1, o2, o3,
               tmp_ref, bi_ref, bj_ref, sems):
        outs = (o0, o1, o2, o3)   # aliased onto the inputs

        def P(i):
            j = jnp.zeros((), jnp.int32)
            for a in range(mrow):
                j = j | (((i >> scal_ref[4 + a]) & 1) << a)
            return j

        def phase(copies_of):
            # start cnt*4 same-shape copies, then drain them — the barrier
            # between phases is what makes in-place pair swaps safe
            def start(s, cnt):
                @pl.when(s < cnt)
                def _():
                    for q, cp in enumerate(copies_of(s)):
                        cp.start()
                return cnt

            def drain(s, cnt):
                @pl.when(s < cnt)
                def _():
                    for q, cp in enumerate(copies_of(s)):
                        cp.wait()
                return cnt

            return start, drain

        def batch(cursor):
            # collect up to W disjoint swap pairs (i < j = P(i)) into SMEM
            def collect(cst):
                cur, cnt = cst
                j = P(cur)
                take = j > cur

                @pl.when(take)
                def _():
                    bi_ref[cnt] = cur
                    bj_ref[cnt] = j

                return cur + 1, jnp.where(take, cnt + 1, cnt)

            cur, cnt = jax.lax.while_loop(
                lambda cst: jnp.logical_and(cst[0] < nblk, cst[1] < W),
                collect, (cursor, jnp.zeros((), jnp.int32)))

            def stage(s):
                return [pltpu.make_async_copy(
                    outs[q].at[pl.ds(bi_ref[s] * Tr, Tr), :],
                    tmp_ref.at[s, q], sems.at[s, q]) for q in range(4)]

            def move(s):
                return [pltpu.make_async_copy(
                    outs[q].at[pl.ds(bj_ref[s] * Tr, Tr), :],
                    outs[q].at[pl.ds(bi_ref[s] * Tr, Tr), :],
                    sems.at[s, q]) for q in range(4)]

            def unstage(s):
                return [pltpu.make_async_copy(
                    tmp_ref.at[s, q],
                    outs[q].at[pl.ds(bj_ref[s] * Tr, Tr), :],
                    sems.at[s, q]) for q in range(4)]

            for copies_of in (stage, move, unstage):
                start, drain = phase(copies_of)
                jax.lax.fori_loop(0, W, start, cnt)
                jax.lax.fori_loop(0, W, drain, cnt)
            return cur

        jax.lax.while_loop(lambda c: c < nblk, batch,
                           jnp.zeros((), jnp.int32))

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            scratch_shapes=[
                pltpu.VMEM((W, 4, Tr, LANES), dt),
                pltpu.SMEM((W,), jnp.int32),
                pltpu.SMEM((W,), jnp.int32),
                pltpu.SemaphoreType.DMA((W, 4)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, LANES), dt)] * 4,
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=4 * dt.itemsize * R2 * LANES,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def fn(scal, re0, re1, im0, im1):
        return call(scal, re0, re1, im0, im1)

    _KERNEL_CACHE[key] = fn
    return fn


def get_split_kernels(n: int, real_dtype, precision: str, interpret: bool,
                      cap_steps: int = CAP_STEPS, cap_mats: int = CAP_MATS):
    """In-place variant for states too large to double-buffer (n >= 30:
    an (in, out) pair of f32 state pairs is 17 GB > 16 GB HBM).

    The state lives as FOUR aliased arrays (column halves h0/h1 of re/im,
    each (R2, 128)); every pallas_call maps inputs onto its outputs with
    ``input_output_aliases`` so the chain executes with ZERO extra state
    buffers.  Aliasing forbids the cross-tile input-prologue steering (a
    grid step may only read the blocks it writes), so cross-tile swaps run
    as a dedicated PAIR-GRID kernel: each grid step owns both tiles of a
    swap pair (j, j | tmask) — it exchanges h1[j] <-> h0[j | tmask], the
    only data an xswap actually moves — making reads == writes per step.
    The tile-index bit is a runtime scalar (one executable per n covers
    every cross-tile bit).

    Returns ``(block_fn, xswap_fn)`` over (scal, re0, re1, im0, im1).
    """
    dt = np.dtype(real_dtype)
    key = ("split", n, cap_steps, cap_mats, dt.str, precision, interpret,
           _STREAM_PLAIN, _mat_kernel())
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    T = tile_rows(n)
    prec = _precision(precision)

    def kernel(scal_ref, re0_ref, re1_ref, im0_ref, im1_ref,
               a_ref, b_ref, p_ref, ore0_ref, ore1_ref, oim0_ref, oim1_ref):
        if _SPLIT_HALVES_NATIVE:
            r0, r1, i0, i1 = _steps_loop_halves(
                scal_ref, a_ref, b_ref, p_ref,
                re0_ref[:], re1_ref[:], im0_ref[:], im1_ref[:],
                cap_steps, T, dt, prec)
            ore0_ref[:] = r0
            ore1_ref[:] = r1
            oim0_ref[:] = i0
            oim1_ref[:] = i1
            return
        sre = jnp.concatenate([re0_ref[:], re1_ref[:]], axis=1)
        sim = jnp.concatenate([im0_ref[:], im1_ref[:]], axis=1)
        sre, sim = _steps_loop(scal_ref, a_ref, b_ref, p_ref, sre, sim,
                               cap_steps, T, dt, prec)
        ore0_ref[:] = sre[:, :LANES]
        ore1_ref[:] = sre[:, LANES:]
        oim0_ref[:] = sim[:, :LANES]
        oim1_ref[:] = sim[:, LANES:]

    half = lambda: pl.BlockSpec((T, LANES), lambda i, scal: (i, 0),
                                memory_space=pltpu.VMEM)
    tab = lambda m: pl.BlockSpec(
        (m, DVIEW, DVIEW), lambda i, scal: (0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R2 // T,),
        in_specs=[half(), half(), half(), half(),
                  tab(cap_mats), tab(cap_mats), tab(LANE_QUBITS)],
        out_specs=[half(), half(), half(), half()],
    )
    block_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R2, LANES), dt)] * 4,
        # alias indices count the scalar-prefetch operand: data inputs 1..4
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * R2 * DVIEW * DVIEW * cap_steps,
            bytes_accessed=dt.itemsize
            * (4 * R2 * DVIEW + 2 * cap_mats * DVIEW * DVIEW),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    # ---- pair-grid cross-tile swap: h1[j] <-> h0[j | (1 << shift)] ----
    def xkern(scal_ref, re1_ref, re0_ref, im1_ref, im0_ref,
              ore1_ref, ore0_ref, oim1_ref, oim0_ref):
        ore1_ref[:] = re0_ref[:]
        ore0_ref[:] = re1_ref[:]
        oim1_ref[:] = im0_ref[:]
        oim0_ref[:] = im1_ref[:]

    def m_lo(p, scal):
        sh = scal[3]
        return ((p >> sh) << (sh + 1)) | (p & ((1 << sh) - 1)), 0

    def m_hi(p, scal):
        r, _ = m_lo(p, scal)
        return r | (1 << scal[3]), 0

    lo = lambda: pl.BlockSpec((T, LANES), m_lo, memory_space=pltpu.VMEM)
    hi = lambda: pl.BlockSpec((T, LANES), m_hi, memory_space=pltpu.VMEM)
    xgrid = max(R2 // T // 2, 1)
    xspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(xgrid,),
        in_specs=[lo(), hi(), lo(), hi()],
        out_specs=[lo(), hi(), lo(), hi()],
    )
    xswap_call = pl.pallas_call(
        xkern,
        grid_spec=xspec,
        out_shape=[jax.ShapeDtypeStruct((R2, LANES), dt)] * 4,
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=interpret,
    )

    stream = (get_stream_split_kernel(n, dt, precision, interpret,
                                      cap_steps, cap_mats)
              if _STREAM_PLAIN else None)

    def block_fn(scal, re0, re1, im0, im1, a_tab, b_tab, p_tab):
        if stream is not None:
            return stream(scal, re0, re1, im0, im1, a_tab, b_tab, p_tab)
        return block_call(scal, re0, re1, im0, im1, a_tab, b_tab, p_tab)

    def xswap_fn(scal, re0, re1, im0, im1):
        re1, re0, im1, im0 = xswap_call(scal, re1, re0, im1, im0)
        return re0, re1, im0, im1

    _KERNEL_CACHE[key] = (block_fn, xswap_fn)
    return block_fn, xswap_fn


def get_stream_split_kernel(n: int, real_dtype, precision: str,
                            interpret: bool, cap_steps: int = CAP_STEPS,
                            cap_mats: int = CAP_MATS):
    """Streaming twin of the ALIASED split block kernel: the four column
    halves stay in ANY memory space with outputs aliased onto inputs, and
    a manual W-deep window streams (T, LANES) tiles HBM -> VMEM ->
    ``_steps_loop_halves`` -> HBM.  Aliasing is safe under streaming
    because writes strictly trail reads per tile: out(t) starts only
    after compute(t) finished reading tile t, and read-ahead in(t+W)
    touches a disjoint tile.

    PAIR MODE (scal[1] == 1): a block whose plan carries a pending
    cross-tile swap streams as swap-pair traffic instead of a separate
    pair-grid xswap pass — the xswap becomes free.  Loop index t maps to
    (pair p = t >> 1, member m = t & 1); member m's working tile is the
    post-swap tile (tl if m == 0 else th = tl | tmask) whose four halves
    gather from srcs[m]/srcs[2+m] at tiles (tl, th) (the swap exchanges
    h1[tl] <-> h0[th], so tl collects the two h0 halves and th the two
    h1 halves).  Aliasing hazard handled explicitly: member 0's output
    overwrites re1[tl]/im1[tl], which member 1 still reads — so at even
    t BOTH members' input copies are waited before member 0's output
    starts; odd t skips its (already-waited) input wait.  Same signature
    as the split ``block_fn``.
    """
    dt = np.dtype(real_dtype)
    key = ("stream-split", n, cap_steps, cap_mats, dt.str, precision,
           interpret, _mat_kernel())
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn

    R2 = 1 << (n - LOCAL_QUBITS)
    T = tile_rows(n)
    nt = R2 // T
    W = min(STREAM_TILES, nt)
    prec = _precision(precision)

    def kernel(scal_ref, s0, s1, s2, s3, a_ref, b_ref, p_ref,
               o0, o1, o2, o3, bufs, outs, isem, osem):
        srcs, dsts = (s0, s1, s2, s3), (o0, o1, o2, o3)
        active = scal_ref[1] == 1
        even = lambda t: (t & 1) == 0

        def pair_tiles(t):
            p, sh = t >> 1, scal_ref[3]
            tl = ((p >> sh) << (sh + 1)) | (p & ((1 << sh) - 1))
            return tl, tl | scal_ref[2]

        def in_d(t, s):
            return [pltpu.make_async_copy(src.at[pl.ds(t * T, T), :],
                                          bufs.at[h, s], isem.at[s, h])
                    for h, src in enumerate(srcs)]

        def in_pair(m, t, s):
            # m is the STATIC member parity (tuple indexing needs it)
            tl, th = pair_tiles(t)
            return [pltpu.make_async_copy(
                src.at[pl.ds(tile * T, T), :], bufs.at[h, s],
                isem.at[s, h])
                for h, (src, tile) in enumerate((
                    (srcs[m], tl), (srcs[m], th),
                    (srcs[2 + m], tl), (srcs[2 + m], th)))]

        def start_in(t, s):
            @pl.when(active & even(t))
            def _():
                for d in in_pair(0, t, s):
                    d.start()

            @pl.when(active & jnp.logical_not(even(t)))
            def _():
                for d in in_pair(1, t, s):
                    d.start()

            @pl.when(jnp.logical_not(active))
            def _():
                for d in in_d(t, s):
                    d.start()

        def wait_in(t, s):
            # pair mode: even t waits BOTH members (see docstring)
            @pl.when(active & even(t))
            def _():
                for d in in_pair(0, t, s):
                    d.wait()
                s2 = jax.lax.rem(t + 1, W)
                for d in in_pair(1, t + 1, s2):
                    d.wait()

            @pl.when(jnp.logical_not(active))
            def _():
                for d in in_d(t, s):
                    d.wait()

        def out_d(t, s):
            return [pltpu.make_async_copy(outs.at[h, s],
                                          dst.at[pl.ds(t * T, T), :],
                                          osem.at[s, h])
                    for h, dst in enumerate(dsts)]

        def out_pair(t, s):
            tl, th = pair_tiles(t)
            tile = jnp.where(even(t), tl, th)
            return [pltpu.make_async_copy(outs.at[h, s],
                                          dst.at[pl.ds(tile * T, T), :],
                                          osem.at[s, h])
                    for h, dst in enumerate(dsts)]

        def start_out(t, s):
            @pl.when(active)
            def _():
                for d in out_pair(t, s):
                    d.start()

            @pl.when(jnp.logical_not(active))
            def _():
                for d in out_d(t, s):
                    d.start()

        def wait_out(t, s):
            @pl.when(active)
            def _():
                for d in out_pair(t, s):
                    d.wait()

            @pl.when(jnp.logical_not(active))
            def _():
                for d in out_d(t, s):
                    d.wait()

        def pro(s, _):
            start_in(s, s)
            return _

        jax.lax.fori_loop(0, W, pro, None, unroll=False)

        def body(t, _):
            s = jax.lax.rem(t, W)
            wait_in(t, s)

            @pl.when(t >= W)
            def _():
                wait_out(t - W, s)

            r0, r1, i0, i1 = _steps_loop_halves(
                scal_ref, a_ref, b_ref, p_ref,
                bufs[0, s], bufs[1, s], bufs[2, s], bufs[3, s],
                cap_steps, T, dt, prec)
            outs[0, s] = r0
            outs[1, s] = r1
            outs[2, s] = i0
            outs[3, s] = i1
            start_out(t, s)

            @pl.when(t + W < nt)
            def _():
                start_in(t + W, s)
            return _

        jax.lax.fori_loop(0, nt, body, None, unroll=False)

        def drain(k, _):
            t = nt - W + k

            @pl.when(t >= 0)
            def _():
                wait_out(t, jax.lax.rem(t, W))
            return _

        jax.lax.fori_loop(0, W, drain, None, unroll=False)

    tab = lambda m: pl.BlockSpec((m, DVIEW, DVIEW), lambda i, scal: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4
            + [tab(cap_mats), tab(cap_mats), tab(LANE_QUBITS)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            scratch_shapes=[pltpu.VMEM((4, W, T, LANES), dt)] * 2
            + [pltpu.SemaphoreType.DMA((W, 4))] * 2,
        ),
        out_shape=[jax.ShapeDtypeStruct((R2, LANES), dt)] * 4,
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * R2 * DVIEW * DVIEW * cap_steps,
            bytes_accessed=dt.itemsize
            * (4 * R2 * DVIEW + 2 * cap_mats * DVIEW * DVIEW),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fn(scal, re0, re1, im0, im1, a_tab, b_tab, p_tab):
        return call(scal, re0, re1, im0, im1, a_tab, b_tab, p_tab)

    _KERNEL_CACHE[key] = fn
    return fn


def get_block_chain_split(n: int, real_dtype, precision: str, interpret: bool,
                          num_blocks: int,
                          cap_steps: int = CAP_STEPS, cap_mats: int = CAP_MATS):
    """In-place chain: lax.scan over stacked entries where each entry is
    either a step block (scal[1] == 0) or a cross-tile pair swap
    (scal[1] == 2, tile bit in scal[3]).  Carry = the four aliased state
    halves; with every kernel aliased in->out the whole chain runs in the
    state's own buffers."""
    dt = np.dtype(real_dtype)
    key = ("split", n, cap_steps, cap_mats, dt.str, precision, interpret,
           num_blocks, _STREAM_PLAIN, _mat_kernel())
    fn = _CHAIN_CACHE.get(key)
    if fn is not None:
        return fn
    block_fn, xswap_fn = get_split_kernels(
        n, dt, precision, interpret, cap_steps, cap_mats)
    R2s = 1 << (n - LOCAL_QUBITS)
    relay = (get_inplace_relayout_kernel(n, dt, interpret)
             if R2s > tile_rows(n) else None)

    def chain_pure(re0, re1, im0, im1, scal, a_tab, b_tab, p_tab):
        def body(carry, x):
            s, a, b = x

            def run_block(c):
                return block_fn(s, *c, a, b, p_tab)

            def run_xswap(c):
                return xswap_fn(s, *c)

            if relay is None:
                return jax.lax.cond(s[1] == 2, run_xswap, run_block,
                                    carry), None

            def run_relayout(c):
                return relay(s, *c)

            def other(c):
                return jax.lax.cond(s[1] == 2, run_xswap, run_block, c)

            return jax.lax.cond(s[1] == 3, run_relayout, other, carry), None

        carry, _ = jax.lax.scan(
            body, (re0, re1, im0, im1), (scal, a_tab, b_tab))
        return carry

    chain = jax.jit(chain_pure, donate_argnums=(0, 1, 2, 3))
    chain.pure = chain_pure
    _CHAIN_CACHE[key] = chain
    return chain


def get_block_chain(n: int, real_dtype, precision: str, interpret: bool,
                    num_blocks: int,
                    cap_steps: int = CAP_STEPS, cap_mats: int = CAP_MATS):
    """jitted lax.scan of ``num_blocks`` kernel calls over stacked tables.

    One compile per (n, capacity, num_blocks) — executables are shared by
    every circuit whose plan chunks to the same power-of-2 sizes.
    """
    dt = np.dtype(real_dtype)
    key = (n, cap_steps, cap_mats, dt.str, precision, interpret, num_blocks,
           _stream_on(n), _mat_kernel())
    fn = _CHAIN_CACHE.get(key)
    if fn is not None:
        return fn
    kernel = get_block_kernel(n, dt, precision, interpret, cap_steps, cap_mats)
    R2 = 1 << (n - LOCAL_QUBITS)
    # cross-tile bits exist: entries may be multi-qubit relayout passes
    relay = (get_relayout_kernel(n, dt, interpret)
             if R2 > tile_rows(n) else None)

    def chain_pure(re, im, scal, a_tab, b_tab, p_tab):
        re = re.reshape(R2, DVIEW)
        im = im.reshape(R2, DVIEW)

        def body(carry, x):
            r, i = carry
            s, a, b = x
            if relay is None:
                return kernel(s, r, i, a, b, p_tab), None

            def run_relayout(c):
                return relay(s, c[0], c[1])

            def run_block(c):
                return kernel(s, c[0], c[1], a, b, p_tab)

            return jax.lax.cond(s[1] == 3, run_relayout, run_block, (r, i)), None

        (re, im), _ = jax.lax.scan(body, (re, im), (scal, a_tab, b_tab))
        return re.reshape(-1), im.reshape(-1)

    chain = jax.jit(chain_pure, donate_argnums=(0, 1))
    chain.pure = chain_pure  # undonated trace for embedding/compile checks
    _CHAIN_CACHE[key] = chain
    return chain


# Per-dispatch work budget: blocks x grid-steps in ONE chain executable.
# A single device execution that runs too long (~65 s measured at n=29 with
# a 512-block chain, grid 4096) crashes/restarts the TPU worker — an
# execution-time watchdog, not a memory or correctness limit (the same 512
# blocks pass as eight 64-block dispatches, norm exact).  2^19 is half the
# longest single dispatch observed healthy (n=28, 512 x 2048).
DISPATCH_GRID_BUDGET = 1 << 19


def _chunks(total: int, max_chunk: int = 1 << 30) -> List[int]:
    """Power-of-2 chunk sizes covering ``total`` blocks, padding allowed.

    Each chunk is one dispatch, and a dispatch over the axon tunnel costs
    ~30 ms — far more than a padded no-op block (one state pass, ~us, with
    all-zero scalars).  So round UP to one chunk whenever padding stays
    under ~25% of the real blocks; otherwise split greedily and recurse.
    The returned sizes may sum to more than ``total``: callers pad tables
    with zero rows (nsteps=0, inactive prologue = identity block).
    ``max_chunk`` bounds any single chunk (the watchdog budget above).
    """
    out = []
    while total > 0:
        up = 1 << (total - 1).bit_length()  # smallest pow2 >= total
        if up <= max_chunk and up - total <= max(total // 4, 2):
            out.append(up)
            return out
        c = min(1 << (total.bit_length() - 1), max_chunk)
        out.append(c)
        total -= c
    return out


def initial_halves(n: int, real_dtype):
    """|0...0> directly as the four (R2, 128) column-half arrays — never
    materializes a flat 2^n buffer (the split transient costs 4.3 GB extra
    at n=30)."""
    R2 = 1 << (n - LOCAL_QUBITS)
    # four DISTINCT buffers (each is donated into the chain; a shared
    # zeros buffer donated multiple times would alias incorrectly)
    re0 = jnp.zeros((R2, LANES), real_dtype).at[0, 0].set(1.0)
    return (re0,
            jnp.zeros((R2, LANES), real_dtype),
            jnp.zeros((R2, LANES), real_dtype),
            jnp.zeros((R2, LANES), real_dtype))


@partial(jax.jit, donate_argnums=(0,))
def _split_component(flat):
    x = flat.reshape(flat.shape[0] // DVIEW, DVIEW)
    return x[:, :LANES], x[:, LANES:]


@partial(jax.jit, donate_argnums=(0, 1))
def _join_component(h0, h1):
    # ONE program: eager concat-then-reshape would run as two XLA programs
    # with two full-size outputs live at once (the n=30 OOM)
    return jnp.concatenate([h0, h1], axis=1).reshape(-1)


def join_halves(re0, re1, im0, im1):
    """(re, im) flat from the four halves, sequenced to cap peak memory."""
    re = _join_component(re0, re1)
    del re0, re1
    re.block_until_ready()   # free the re halves before joining im
    im = _join_component(im0, im1)
    return re, im


# ------------------------------------------------------------------ program
def _fold_relayout_entries(entries: Sequence[_Block]) -> List[_Block]:
    """Merge (standalone relayout, following plain step block) pairs.

    QSIM_STREAM_RELAYOUT: the streaming block kernel sources its input
    copies THROUGH a pending row-block permutation at relayout-tile
    granularity (scal mode 5), so a relayout immediately followed by a
    plain step block needs no state pass of its own — the sigma rides the
    next block's input DMA (docs/ROADMAP.md design note 1).  Pairs where
    the next block already carries an xswap prologue (the steered input
    path owns the sourcing), is itself a relayout/gswap entry, or is
    empty keep the standalone form.
    """
    out: List[_Block] = []
    for blk in entries:
        prev = out[-1] if out else None
        if (prev is not None and prev.relayout is not None
                and not prev.kinds
                and blk.relayout is None and blk.relayout_pro is None
                and blk.gswap is None and blk.prologue is None
                and blk.kinds):
            out[-1] = _Block(kinds=blk.kinds, midx=blk.midx, mats=blk.mats,
                             relayout_pro=prev.relayout)
        else:
            out.append(blk)
    return out


def materialize_entries(entries: Sequence[_Block], cap_steps: int,
                        cap_mats: int, dt, inplace: bool = False,
                        single_class: bool = False,
                        max_chunk: int = 1 << 30,
                        fold_relayout: bool = False,
                        mono_as_mat: bool = False):
    """Pack plan entries into grouped, pow-2-chunked scal + factor tables.

    Two block classes keep table H2D near the real content volume:
    swap-forced blocks carry ~1-2 matrices, so padding them to cap_mats
    would ship mostly zeros.  Short thin runs are promoted to full so class
    changes don't fragment the scan chains.  Tables ship as COMPACT factors
    (u <= 128x128 + two 256-entry vectors per op, ~4x less host-link
    traffic than the expanded 256x256 tables) and are expanded on device
    per chunk (_get_expander).

    Returns a list of (cap, chunk_sizes, scal, u_re, u_im, mvec, hvec,
    mvec_o, hvec_o, phases, mono); chunk_sizes may cover more rows than
    real entries (zero rows = identity blocks).  The _o vectors are the
    output-side window indices with any folded perm steps composed in.
    MONOMIAL mats ship the 0/1 pattern in u_re plus compact (2, 128)
    cos/sin row-phase vectors (see _get_expander).  Shared by
    PrefetchProgram and the mesh engine (parallel/sharded_prefetch.py).
    """
    if fold_relayout:
        entries = _fold_relayout_entries(entries)
    if single_class:
        # large-n mode: every entry shares ONE capacity class so the whole
        # circuit chains as a handful of pow-2 chunks.  Class alternation
        # at n >= 22 fragmented plans into 20-40 chain parts, and each
        # part costs one serialized ~30 ms tunnel dispatch — measured
        # ~0.7 s of pure dispatch latency at n=24 (the cap is small there
        # anyway: swap-bounded blocks average ~2.4 matrices).
        cls = [cap_mats for _ in entries]
    else:
        THIN = 2
        cls = [THIN if len(b.mats) <= THIN else cap_mats for b in entries]
        i = 0
        while i < len(cls):
            if cls[i] == THIN:
                j = i
                while j < len(cls) and cls[j] == THIN:
                    j += 1
                if j - i < 8:
                    for t in range(i, j):
                        cls[t] = cap_mats
                i = j
            else:
                i += 1

    groups: List[Tuple[int, List[_Block]]] = []
    for c, blk in zip(cls, entries):
        if groups and groups[-1][0] == c:
            groups[-1][1].append(blk)
        else:
            groups.append((c, [blk]))

    out = []
    for cap, blks in groups:
        B = len(blks)
        sizes = _chunks(B, max_chunk)
        Bp = sum(sizes)
        scal = np.zeros((Bp, 4 + 2 * cap_steps + RELAYOUT_SLOTS),
                        dtype=np.int32)
        u_re = np.zeros((Bp, cap, UPAD, UPAD), dtype=dt)
        u_im = np.zeros((Bp, cap, UPAD, UPAD), dtype=dt)
        mvec = np.zeros((Bp, cap, DVIEW), dtype=np.int32)
        hvec = np.zeros((Bp, cap, DVIEW), dtype=np.int32)
        mvec_o = np.zeros((Bp, cap, DVIEW), dtype=np.int32)
        hvec_o = np.zeros((Bp, cap, DVIEW), dtype=np.int32)
        phases = np.zeros((Bp, cap, 2, UPAD), dtype=dt)
        mono = np.zeros((Bp, cap), dtype=np.int32)
        for i, blk in enumerate(blks):
            k = len(blk.kinds)
            scal[i, 0] = k
            if blk.prologue is not None:
                # inplace (grid kernels): a standalone pair-swap entry
                # (flag 2) — unless streaming, where the pair-mode split
                # kernel folds the swap into the block (flag 1, like the
                # flat engine's input-DMA prologue)
                scal[i, 1] = 2 if (inplace and not _STREAM_PLAIN) else 1
                scal[i, 2] = blk.prologue[0]
                scal[i, 3] = blk.prologue[1]
            if blk.relayout is not None:
                # flat: one-pass DMA relabeling; inplace: pair-swap kernel
                # (both take the same sigma encoding)
                scal[i, 1] = 3
                scal[i, 4 : 4 + len(blk.relayout)] = blk.relayout
                continue
            if blk.gswap is not None:
                # mesh-bit exchange: only the sharded chain executes these
                # (parallel/sharded_prefetch.py)
                scal[i, 1] = 4
                scal[i, 2] = blk.gswap
                continue
            if blk.relayout_pro is not None:
                # folded relayout (streaming kernel mode 5): sigma rides
                # the scal TAIL so kinds/midx keep their slots
                m = len(blk.relayout_pro)
                assert m <= RELAYOUT_SLOTS, (m, RELAYOUT_SLOTS)
                scal[i, 1] = 5
                scal[i, 4 + 2 * cap_steps : 4 + 2 * cap_steps + m] = (
                    blk.relayout_pro)
            scal[i, 4 : 4 + k] = blk.kinds
            scal[i, 4 + cap_steps : 4 + cap_steps + k] = blk.midx
            for s, (u, positions, operm) in enumerate(blk.mats):
                d = u.shape[0]
                # must mirror add_mat's kind choice: under mono-as-mat the
                # plan records kind 0, so the slot ships generic (re, im)
                # tables — a mono-encoded table would drop the phases
                theta = None if mono_as_mat else _monomial_phases(u)
                if theta is None:
                    u_re[i, s, :d, :d] = u.real
                    u_im[i, s, :d, :d] = u.imag
                else:
                    # mono slot: a-table = pure 0/1 gather pattern; the
                    # phase rotation rides rows 0/1 of the b-table
                    u_re[i, s, :d, :d] = (np.abs(u) > 1e-12).astype(dt)
                    phases[i, s, 0, :d] = np.cos(theta)
                    phases[i, s, 1, :d] = np.sin(theta)
                    mono[i, s] = 1
                m, h = _window_vectors(tuple(positions))
                mvec[i, s] = m
                hvec[i, s] = h
                if operm is None:
                    mvec_o[i, s] = m
                    hvec_o[i, s] = h
                else:
                    # folded perm steps: output window index v reads the
                    # mat's output at operm(v) (see _get_expander)
                    mvec_o[i, s] = m[operm]
                    hvec_o[i, s] = h[operm]
        out.append((cap, sizes, scal, u_re, u_im, mvec, hvec, mvec_o, hvec_o,
                    phases, mono))
    return out


class PrefetchProgram:
    """Device tables + shared executables for one planned circuit.

    Construction compiles NOTHING new once the (n, capacity, chunk) chains
    exist — only numpy planning plus one H2D of the stacked tables.
    ``__call__`` maps flat (2^n,) state parts through the chain; output is
    in PHYSICAL positions (undo ``final_position``).
    """

    def __init__(
        self,
        ops: Sequence[Op],
        num_qubits: int,
        real_dtype=jnp.float32,
        precision: str = "highest",
        interpret: Optional[bool] = None,
        cap_steps: int = CAP_STEPS,
        cap_mats: int = CAP_MATS,
        final_layout: Optional[Sequence[int]] = None,
        inplace: bool = False,
        reorder: bool = True,
    ):
        n = num_qubits
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        dt = np.dtype(real_dtype)
        planner = (plan_prefetch_best
                   if reorder and n >= PORTFOLIO_MIN_QUBITS else plan_prefetch)
        plan = planner(ops, n, cap_steps=cap_steps, cap_mats=cap_mats,
                       final_layout=final_layout, reorder=reorder,
                       involution_relayout=inplace)
        self.num_qubits = n
        self.final_position = plan.final_position
        self.num_ops = plan.num_ops
        self.num_tswaps = plan.num_tswaps
        self.num_xswaps = plan.num_xswaps
        self.num_blocks = len(plan.blocks)
        self.inplace = inplace
        self._R2 = 1 << (n - LOCAL_QUBITS)
        self._ptab = perm_table(dt)

        entries = plan.blocks
        if inplace and not _STREAM_PLAIN:
            # aliased in-place GRID chains cannot steer a cross-tile swap
            # through the input DMA (a grid step may only read what it
            # writes), so every prologue is hoisted into a standalone
            # pair-swap entry; the streaming split kernel instead folds
            # the swap into the block's pair-mode input stream
            entries = []
            for blk in plan.blocks:
                if blk.relayout is not None:
                    # standalone in-place pair-swap relayout entry
                    entries.append(blk)
                    continue
                if blk.prologue is not None:
                    entries.append(_Block(prologue=blk.prologue))
                entries.append(
                    _Block(kinds=blk.kinds, midx=blk.midx, mats=blk.mats))

        # greedy power-of-2 chunking per group: few dispatches, executables
        # shared across circuits (no per-depth compiles, minimal padding)
        self._chain_parts = []
        self._host_parts = []
        single_class = (not inplace) and cap_mats <= 4
        grid_rows = max(self._R2 // tile_rows(n), 1)
        max_chunk = max(32, DISPATCH_GRID_BUDGET // grid_rows)
        for (cap, sizes, scal, u_re, u_im, mvec, hvec, mvec_o,
             hvec_o, phases, mono) in materialize_entries(
                entries, cap_steps, cap_mats, dt, inplace=inplace,
                single_class=single_class, max_chunk=max_chunk,
                fold_relayout=resolve_stream_relayout(n, inplace),
                mono_as_mat=plan.mono_as_mat):
            off = 0
            for c in sizes:
                chain_builder = get_block_chain_split if inplace else get_block_chain
                chain = chain_builder(n, dt, precision, interpret, c, cap_steps, cap)
                if inplace:
                    # large-n mode: keep COMPACT HOST factors and expand
                    # per part at run time, freeing each part's expanded
                    # tables as the chain drains — peak device memory is
                    # the state halves + ONE part's tables, not the whole
                    # circuit's (1.6 GB at n=30, the margin that OOMed)
                    self._host_parts.append(
                        (
                            chain, c, cap,
                            np.ascontiguousarray(scal[off : off + c]),
                            np.ascontiguousarray(u_re[off : off + c]),
                            np.ascontiguousarray(u_im[off : off + c]),
                            np.ascontiguousarray(mvec[off : off + c]),
                            np.ascontiguousarray(hvec[off : off + c]),
                            np.ascontiguousarray(mvec_o[off : off + c]),
                            np.ascontiguousarray(hvec_o[off : off + c]),
                            np.ascontiguousarray(phases[off : off + c]),
                            np.ascontiguousarray(mono[off : off + c]),
                        )
                    )
                else:
                    expander = _get_expander(c, cap, dt)
                    a_tab, b_tab = expander(
                        jnp.asarray(u_re[off : off + c]),
                        jnp.asarray(u_im[off : off + c]),
                        jnp.asarray(mvec[off : off + c]),
                        jnp.asarray(hvec[off : off + c]),
                        jnp.asarray(mvec_o[off : off + c]),
                        jnp.asarray(hvec_o[off : off + c]),
                        jnp.asarray(phases[off : off + c]),
                        jnp.asarray(mono[off : off + c]),
                    )
                    self._chain_parts.append(
                        (chain, jnp.asarray(scal[off : off + c]), a_tab, b_tab)
                    )
                off += c
        self._dt = dt

    def run_parts(self, re0, re1, im0, im1):
        """In-place execution on the four column-half state arrays.

        Tables are expanded on device per chain part and freed as soon as
        that part's scan has consumed them.
        """
        assert self.inplace
        dt = self._dt
        parts = (re0, re1, im0, im1)
        for i, (chain, c, cap, scal, u_re, u_im, mvec, hvec, mvec_o,
                hvec_o, phases, mono) in enumerate(self._host_parts):
            expander = _get_expander(c, cap, dt)
            a_tab, b_tab = expander(
                jnp.asarray(u_re), jnp.asarray(u_im),
                jnp.asarray(mvec), jnp.asarray(hvec),
                jnp.asarray(mvec_o), jnp.asarray(hvec_o),
                jnp.asarray(phases), jnp.asarray(mono),
            )
            parts = chain(*parts, jnp.asarray(scal), a_tab, b_tab, self._ptab)
            del a_tab, b_tab
            if i % 4 == 3:
                # throttle dispatch: unbounded async queuing allocates EVERY
                # part's expanded tables before execution frees any — the
                # whole-circuit 1.6 GB that in-place mode exists to avoid
                parts[0].block_until_ready()
        return parts

    def __call__(self, re, im):
        if self.inplace:
            # split into the four aliased column-half arrays; every chain
            # kernel writes into the state's own buffers (zero extra 2^n
            # allocations — what makes n >= 30 fit in 16 GB HBM).  Split
            # SEQUENTIALLY: slicing both components while both full arrays
            # are live peaks at 4x half-state (17 GB at n=30).
            re0, re1 = _split_component(re)
            del re
            re0.block_until_ready()
            im0, im1 = _split_component(im)
            del im
            im0.block_until_ready()
            re0, re1, im0, im1 = self.run_parts(re0, re1, im0, im1)
            return join_halves(re0, re1, im0, im1)
        for chain, scal, a_tab, b_tab in self._chain_parts:
            re, im = chain(re, im, scal, a_tab, b_tab, self._ptab)
        return re, im


def iterate_program(prog: "PrefetchProgram", repetitions: int):
    """One-dispatch iterated execution: (re, im) -> program^repetitions.

    A layout-closed prefetch program (``final_layout`` = identity) maps the
    original basis to itself, so repetitions compose directly.  This wraps
    the program's whole chain in a ``lax.scan`` over repetitions — the
    TPU-scale analog of the reference's constant-table re-upload loop
    (quantum_simulator_preproces_constant_only.cu:312-340) with ONE device
    dispatch for ALL iterations.  Tables enter as runtime arguments, so the
    compiled executable is shared by every circuit whose plan chunks to the
    same shapes; a Grover/Trotter/QAOA driver pays zero per-iteration
    compiles AND zero per-iteration dispatches.
    """
    if prog.inplace:
        raise ValueError("iterate_program requires the double-buffered "
                         "program (inplace=False)")
    cache = getattr(prog, "_iter_cache", None)
    if cache is None:
        cache = prog._iter_cache = {}
    fn = cache.get(repetitions)
    if fn is not None:
        return fn

    chains = [part[0] for part in prog._chain_parts]
    tables = []
    for _, scal, a_tab, b_tab in prog._chain_parts:
        tables.extend((scal, a_tab, b_tab))

    def whole(re, im, ptab, *flat):
        for i, chain in enumerate(chains):
            scal, a_tab, b_tab = flat[3 * i : 3 * i + 3]
            re, im = chain.pure(re, im, scal, a_tab, b_tab, ptab)
        return re, im

    @partial(jax.jit, donate_argnums=(0, 1))
    def scanned(re, im, ptab, *flat):
        def body(carry, _):
            return whole(*carry, ptab, *flat), None

        (re, im), _ = jax.lax.scan(
            body, (re, im), None, length=repetitions)
        return re, im

    def run(re, im):
        return scanned(re, im, prog._ptab, *tables)

    cache[repetitions] = run
    return run


_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_LIMIT = 16


def build_prefetch_program(
    ops: Sequence[Op],
    num_qubits: int,
    real_dtype=jnp.float32,
    precision: str = "highest",
    interpret: Optional[bool] = None,
    cap_steps: int = CAP_STEPS,
    cap_mats: int = CAP_MATS,
    final_layout: Optional[Sequence[int]] = None,
    inplace: bool = False,
    reorder: bool = True,
) -> PrefetchProgram:
    h = hashlib.sha256(
        f"p|{num_qubits}|{np.dtype(real_dtype)}|{precision}|{cap_steps}|{cap_mats}"
        f"|{inplace}|{reorder}"
        # kernel-routing knobs: programs bake chain executables at build
        # time, so an in-process A/B flipping these must rebuild
        f"|{_stream_on(num_qubits, inplace)}"
        f"|{resolve_stream_relayout(num_qubits, inplace)}|{_mat_kernel()}"
        f"|{resolve_mono_as_mat(num_qubits, inplace)}|{PERM_AS_MAT}"
        f"|{None if final_layout is None else list(final_layout)}".encode()
    )
    for op in ops:
        h.update(op.kind.encode())
        h.update(np.asarray(op.qubits, dtype=np.int64).tobytes())
        if op.u is not None:
            h.update(np.ascontiguousarray(op.u).tobytes())
    key = h.hexdigest()
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = PrefetchProgram(
            ops, num_qubits, real_dtype, precision, interpret, cap_steps, cap_mats,
            final_layout=final_layout, inplace=inplace, reorder=reorder,
        )
        if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_LIMIT:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        _PROGRAM_CACHE[key] = prog
    return prog


_RUN_CACHE: dict = {}
_RUN_CACHE_LIMIT = 8


def _circuit_fingerprint(circuit) -> str:
    """Cheap hash over the gate stream (vs hashing 100s of MB of fused
    matrices): names, qubits, params, qubit count.

    Four bulk updates instead of 3 numpy allocations per gate — the
    per-gate form cost ~11 ms on the 2445-gate benchmark circuit, half
    of the engine's total host-side overhead.  Unambiguous: the name
    stream is separator-joined and the qubit stream carries an arity
    sentinel, so (names, qubits, param counts, params) reconstruct the
    gate list uniquely."""
    gates = circuit.gates
    cached = getattr(circuit, "_fp_cache", None)
    if cached is not None and cached[0] == len(gates):
        return cached[1]
    h = hashlib.sha256(f"c|{circuit.num_qubits}|{len(gates)}".encode())
    h.update("|".join(g.name for g in gates).encode())
    h.update(np.array([q for g in gates for q in (-1,) + g.qubits],
                      dtype=np.int32).tobytes())
    h.update(np.array([len(g.params) for g in gates],
                      dtype=np.int8).tobytes())
    h.update(np.array([p for g in gates for p in g.params],
                      dtype=np.float64).tobytes())
    fp = h.hexdigest()
    # Gates are frozen and gate lists append-only (Circuit.append), so a
    # length-keyed instance cache is sound — same pattern as to_soa's
    # _soa_cache.  The benchmark's 5-run protocol re-fingerprints one
    # circuit: ~1.8 ms/run of pure host overhead made free.
    try:
        circuit._fp_cache = (len(gates), fp)
    except AttributeError:   # slotted/foreign circuit objects
        pass
    return fp


def resolve_prefetch_knobs(config, n: int, inplace: bool):
    """(max_high, cap_mats, window) for the fusion/plan stage.

    Config fields win; unset fields fall back to the QSIM_PREFETCH_MAX_HIGH
    / QSIM_PREFETCH_CAP_MATS / QSIM_FUSION_WINDOW env overrides (the
    on-chip A/B hook for scripts/plan_model.py --tune candidates), then to
    the measured defaults.  At n >= 21 flat: window=16 + cap_mats=8
    (on-chip A/B knob_ab.log 2026-08-19: 18.91 -> 15.18 s at n=24 and
    91.3 -> 89.2 s at n=26 on grover_like, compounding with the
    mono-as-mat lowering to 11.06 s at n=24).  In-place at n >= 29 gets
    the same pair (inplace_knob_ab n30knobs arm 2026-08-19: 156.9/166.9
    default -> 136.5 s warm at n=30, with mono-as-mat).  Otherwise
    window=8 (fusion_ab.json) + engine CAP_MATS (the n=18 flagship point
    was tuned separately and keeps its measured optimum)."""
    import os

    knobbed = (n >= 21 and not inplace) or (
        inplace and n >= MONO_INPLACE_AUTO_MIN_QUBITS)
    max_high = getattr(config, "prefetch_max_high", None)
    if max_high is None and os.environ.get("QSIM_PREFETCH_MAX_HIGH"):
        max_high = int(os.environ["QSIM_PREFETCH_MAX_HIGH"])
    if max_high is None:
        max_high = 2
    cap_mats = getattr(config, "prefetch_cap_mats", None)
    if cap_mats is None and os.environ.get("QSIM_PREFETCH_CAP_MATS"):
        cap_mats = int(os.environ["QSIM_PREFETCH_CAP_MATS"])
    if cap_mats is None:
        cap_mats = 8 if knobbed else CAP_MATS
    window = getattr(config, "fusion_window", None)
    if window is None and os.environ.get("QSIM_FUSION_WINDOW"):
        window = int(os.environ["QSIM_FUSION_WINDOW"])
    if not window:
        window = 16 if knobbed else 8
    return int(max_high), int(cap_mats), int(window)


def run_prefetch(circuit, config, initial_parts=None, return_halves=False):
    """Simulator facade entry; returns (re, im, num_items, residual_perm).

    ``return_halves``: with the in-place engine, skip the final join and
    return the four (R2, 128) column-half arrays as ``(re0, re1, im0,
    im1)`` in place of (re, im).  At n=30 the join needs a contiguous
    4.3 GB allocation in a heap fragmented by the run — measurement
    helpers (sampling.sample_halves / norm_halves) work on the halves
    directly and never materialize a flat 2^n buffer.
    """
    from ..ops.apply import initial_state_parts
    from .simulator import _fuse_pipeline

    n = circuit.num_qubits
    if n > 30:
        # fail BEFORE planning/allocating: n = 30 is the single-chip
        # ceiling (16 GB HBM holds it only as split column halves)
        raise ValueError(
            f"n = {n} exceeds the single-chip ceiling (n = 30); use "
            "strategy='sharded' over a multi-chip mesh")
    if config.dtype != "complex64":
        raise ValueError(
            "the prefetch strategy is float32-only (Mosaic kernels); use "
            "mxu/reference for complex128 parity checks"
        )
    real_dtype = jnp.float32

    def start():
        if initial_parts is not None:
            return (
                jnp.asarray(initial_parts[0], dtype=real_dtype),
                jnp.asarray(initial_parts[1], dtype=real_dtype),
            )
        return initial_state_parts(n, dtype=real_dtype)

    if n < MIN_QUBITS:
        if return_halves:
            raise ValueError(
                f"split-state halves need the (rows, 256) layout, i.e. "
                f"n >= {MIN_QUBITS}; got n = {n}")
        from ..passes.fuse4x4 import fuse_4x4
        from ..passes.fuse_k import fuse_k
        from .megakernel import build_megakernel

        ops = fuse_k(fuse_4x4(circuit), max_qubits=min(config.max_fused_qubits, n))
        re, im = start()
        re, im = build_megakernel(ops, n, real_dtype)(re, im)
        return re, im, len(ops), None

    # relabel hot qubits low (the corrected reference permute pass) and have
    # the plan itself route the state back to the ORIGINAL basis: the
    # returned residual is always None
    from ..passes.permute import plan_permutation, unpermute_state

    perm = plan_permutation(circuit)
    if np.array_equal(perm, np.arange(n)):
        perm = None

    # In-place aliased chains from n=30 up: a double-buffered f32 state
    # pair is 2^(n+3) bytes in+out — 17 GB at n=30, over the 16 GB HBM.
    inplace = getattr(config, "prefetch_inplace", None)
    if inplace is None:
        inplace = n >= 30
    reorder = getattr(config, "prefetch_reorder", None)
    if reorder is None:
        reorder = True
    max_high, cap_mats, window = resolve_prefetch_knobs(
        config, n, bool(inplace))
    from ..config import resolve_precision

    precision = resolve_precision(getattr(config, "precision", "highest"), n)

    run_key = (
        _circuit_fingerprint(circuit), precision,
        config.max_fused_qubits, str(np.dtype(real_dtype)), bool(inplace),
        bool(reorder), max_high, cap_mats, window,
        # kernel-routing flags: programs bake their chain executables at
        # build time, so an in-process A/B toggling these must not reuse
        # the other arm's program
        _STREAM_PLAIN, resolve_stream_relayout(n, bool(inplace)),
        _mat_kernel(),
        resolve_mono_as_mat(n, bool(inplace)), PERM_AS_MAT,
    )
    cached = _RUN_CACHE.get(run_key)
    if cached is not None:
        prog = cached
    else:
        if perm is None:
            work = circuit
            final_layout = np.arange(n)  # still route back to identity
        else:
            work = circuit.relabeled(perm)
            final_layout = np.argsort(perm)
        ops = _fuse_pipeline(
            work, min(config.max_fused_qubits, LANE_QUBITS),
            max_high=max_high, window=window
        )
        prog = build_prefetch_program(
            ops, n, real_dtype, precision=precision,
            cap_mats=cap_mats,
            final_layout=final_layout, inplace=bool(inplace),
            reorder=bool(reorder),
        )
        if len(_RUN_CACHE) >= _RUN_CACHE_LIMIT:
            _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
        _RUN_CACHE[run_key] = prog

    if initial_parts is not None and len(initial_parts) == 4:
        # column-half resume (save_state_halves): rebuild the flat host
        # pair once — host RAM, never a device join
        re0, re1, im0, im1 = (np.asarray(x) for x in initial_parts)
        initial_parts = (np.concatenate([re0, re1], axis=1).reshape(-1),
                         np.concatenate([im0, im1], axis=1).reshape(-1))
    if perm is not None and initial_parts is not None:
        iv = np.asarray(initial_parts[0]) + 1j * np.asarray(initial_parts[1])
        iv = unpermute_state(iv, np.argsort(perm))
        initial_parts = (np.ascontiguousarray(iv.real), np.ascontiguousarray(iv.imag))

    if prog.inplace:
        # construct the state directly as column halves — the flat-state
        # split transient is the memory margin at n >= 30
        if initial_parts is None:
            parts = initial_halves(n, real_dtype)
        else:
            R2 = 1 << (n - LOCAL_QUBITS)
            r2 = np.asarray(initial_parts[0]).reshape(R2, DVIEW)
            i2 = np.asarray(initial_parts[1]).reshape(R2, DVIEW)
            parts = tuple(
                jnp.asarray(np.ascontiguousarray(h), dtype=real_dtype)
                for h in (r2[:, :LANES], r2[:, LANES:],
                          i2[:, :LANES], i2[:, LANES:])
            )
        parts = prog.run_parts(*parts)
        if return_halves:
            total = prog.num_ops + prog.num_tswaps + prog.num_xswaps
            return parts, None, total, None
        re, im = join_halves(*parts)
    else:
        if return_halves:
            raise ValueError("return_halves requires the in-place engine "
                             "(prefetch_inplace=True or n >= 30)")
        re, im = start()
        re, im = prog(re, im)

    # the plan ends with relabeled qubit j at position argsort(perm)[j] —
    # the ORIGINAL basis exactly — so there is never a residual to undo
    return re, im, prog.num_ops + prog.num_tswaps + prog.num_xswaps, None
