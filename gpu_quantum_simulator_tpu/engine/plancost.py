"""Plan cost model: estimate device seconds of a prefetch plan from
per-grid-step kernel costs so the planner can choose between candidate
plans (lookahead-depth portfolio) without the TPU in the loop.

Constants are the n=24 calibration documented in
``bench_artifacts/kernel_micro_n24.json`` (measured entries) with the
documented estimates for step kinds not yet measured on-chip; the offline
harness ``scripts/plan_model.py`` refreshes them from committed microbench
JSONs.  Only RELATIVE fidelity matters for plan selection — all candidate
plans share the same constants.

Per-grid-step costs (us):
  base (steered 4-stream)   10.4   empty pass, halves + concat
  base (plain 2-stream)      6.0   estimate until measured on-chip
  base (in-place split)      8.0   halves-native aliased kernel (estimate)
  mat                        5.2   3 Karatsuba 256-wide matmuls
  mono                       3.7   gather matmul + VPU phase rotation (est)
  perm (p_tab dot pair)      3.5   estimate (~2/3 mat) until measured
  tswap(k)                   1.76 + 0.675*(k-1) (pre-static-roll ladder)
  relayout pass             10.9   pure-DMA block permutation
"""

from __future__ import annotations

US = 1e-6
BASE_STEERED = 10.4
BASE_PLAIN = 6.0
BASE_SPLIT = 8.0
MAT = 5.2
PERM = 3.5
MONO = 3.7
RELAYOUT = 10.9
# folded-relayout input surcharge per grid step (QSIM_STREAM_RELAYOUT):
# the block's input drops to Tr-granular copies sourced through sigma —
# same bytes, more DMA issues.  Estimate until scripts/dma_probe.py
# prices Tr-sized copies (hbmTr64 vs hbmTr512).
FOLD_IN = 2.0
XSWAP_SPLIT = None   # in-place pair-grid swap pass (None -> BASE_PLAIN/2)
DISPATCH_S = 0.030   # per chain part over the axon tunnel

TSWAP_PTS: dict = {}  # k -> us measured anchors (linear-fit fallback)


def tswap_us(k: int) -> float:
    if TSWAP_PTS:
        ks = sorted(TSWAP_PTS)
        if k <= ks[0]:
            return TSWAP_PTS[ks[0]]
        for a, b in zip(ks, ks[1:]):
            if k <= b:
                t = (k - a) / (b - a)
                return TSWAP_PTS[a] * (1 - t) + TSWAP_PTS[b] * t
        return TSWAP_PTS[ks[-1]]
    return 1.76 + 0.675 * (k - 1)


def estimate_plan(plan, n: int, inplace: bool = False, stream: bool = False,
                  fold_relayout: bool = False):
    """(seconds, breakdown dict) for one PrefetchPlan at width n.

    ``stream`` models the QSIM_STREAM_PLAIN chains: in-place xswaps ride
    the block's pair-mode input stream (no standalone pass) and steered
    flat blocks cost the streamed base.  ``fold_relayout`` models the
    QSIM_STREAM_RELAYOUT chains: a relayout followed by a plain step block
    drops its standalone pass; the follower pays FOLD_IN on its base
    (mirrors prefetch._fold_relayout_entries).
    """
    from . import prefetch as P

    T = P.tile_rows(n)
    gs = max((1 << (n - P.LOCAL_QUBITS)) // T, 1)
    logt = plan.logt
    blocks = plan.blocks
    folds_away: set = set()   # relayout entries that fold forward
    fold_into: set = set()    # step blocks paying the folded-input base
    if fold_relayout and not inplace:
        for i in range(len(blocks) - 1):
            b, nxt = blocks[i], blocks[i + 1]
            if (i not in fold_into and b.relayout is not None
                    and not b.kinds and nxt.relayout is None
                    and nxt.gswap is None and nxt.prologue is None
                    and nxt.kinds):
                folds_away.add(i)
                fold_into.add(i + 1)
    acc = {"base": 0.0, "mat": 0.0, "mono": 0.0, "tswap": 0.0, "perm": 0.0,
           "relayout": 0.0, "xswap": 0.0}
    for i, b in enumerate(blocks):
        if b.relayout is not None:
            if i not in folds_away:
                acc["relayout"] += RELAYOUT * gs
            continue
        if b.gswap is not None:
            continue
        if inplace and b.prologue is not None:
            # grid chains hoist the prologue into a standalone pair-grid
            # swap entry (half grid) + a plain step block; streaming
            # chains fold the swap into the block's pair-mode input
            if not stream:
                acc["xswap"] += (XSWAP_SPLIT * gs if XSWAP_SPLIT is not None
                                 else BASE_PLAIN * gs / 2)
            base = BASE_SPLIT
        else:
            base = (BASE_SPLIT if inplace else
                    BASE_STEERED if b.prologue is not None else BASE_PLAIN)
        if i in fold_into:
            base += FOLD_IN
        acc["base"] += base * gs
        for kind in b.kinds:
            if kind == 0:
                acc["mat"] += MAT * gs
            elif kind == logt + 1:
                acc["perm"] += PERM * gs
            elif kind == logt + 2:
                acc["mono"] += MONO * gs
            else:
                acc["tswap"] += tswap_us(kind) * gs
    total = sum(acc.values()) * US
    # chain parts: approximate with the real chunker on the block count
    max_chunk = max(32, P.DISPATCH_GRID_BUDGET // gs)
    nparts = len(P._chunks(len(blocks) - len(folds_away), max_chunk))
    total += nparts * DISPATCH_S
    acc["dispatch_parts"] = nparts
    return total, acc


# v5e ICI: ~45 GB/s effective one-way per link (scaling-book class numbers;
# a projection constant until a pod is available to measure).
ICI_GBS = 45.0
GSWAP_LAT_US = 25.0  # ppermute launch + barrier slack per exchange
HBM_EFF_GBS = 233.0  # measured XLA elementwise-pass ceiling on this part
                     # (scripts/dma_probe.py, bench_artifacts/dma_probe_n24.json)


def estimate_plan_sharded(plan, n: int, d: int):
    """(seconds, breakdown) for a mesh plan: local steps at nl = n - d per
    chip (all chips in parallel) + gswap half-block ICI exchanges."""
    nl = n - d
    secs, acc = estimate_plan(plan, nl)
    gswap_us = (1 << nl) * 4 / (ICI_GBS * 1e9) * 1e6 + GSWAP_LAT_US
    acc["gswap"] = plan.num_gswaps * gswap_us * US
    return secs + acc["gswap"], acc


def estimate_shard_plan(plan, n: int):
    """(seconds, breakdown) for a dense-engine ``ShardPlan``
    (passes/shard.py over parallel/sharded.py).

    Every plan item is one per-device pass over the 2^(n-d) local block
    (read + write at the measured HBM ceiling); a ``SwapItem`` additionally
    ships exactly half the block across ICI — the term is
    ``plan.ici_bytes_per_device() / ICI_GBS`` spread over its swaps, plus a
    per-exchange latency.  All 2^d devices run in parallel, so per-device
    seconds ARE plan seconds (the reference has no analog: its one GPU
    permutes labels instead, quantum_simulator_preproces_permute.cu:388-413).
    """
    from ..passes.shard import LocalSwapItem, SwapItem

    nl = n - plan.num_global
    blk_bytes = 2 * (1 << nl) * 4           # split re/im float32 block
    pass_s = 2 * blk_bytes / (HBM_EFF_GBS * 1e9)   # read + write
    swap_ici_s = ((1 << (nl - 1)) * 2 * 4 / (ICI_GBS * 1e9)
                  + GSWAP_LAT_US * US)
    acc = {"ops": 0.0, "local_swaps": 0.0, "gswap_ici": 0.0,
           "gswap_hbm": 0.0}
    for it in plan.items:
        if isinstance(it, SwapItem):
            acc["gswap_ici"] += swap_ici_s
            acc["gswap_hbm"] += pass_s      # select + reassemble the halves
        elif isinstance(it, LocalSwapItem):
            acc["local_swaps"] += pass_s
        else:
            acc["ops"] += pass_s
    return sum(acc.values()), acc


def choose_num_global(ops, n: int, num_devices: int, segmented: bool = False,
                      victim_policy: str = "cold", max_local_high=None):
    """Pick the mesh split d (the number of device-id qubits) by MODELED
    seconds instead of swap counts.

    Plans each candidate d in 1..log2(num_devices) with the matching
    planner (dense ShardPlan, or the segmented prefetch planner at
    ``num_global=d``) and returns ``(best_d, {d: modeled_seconds})``.
    Larger d shrinks every local pass 2x but adds gswap exchanges; the
    model prices both, so the split follows the circuit, not the device
    count.  Infeasible candidates (an op wider than the local region) are
    skipped.
    """
    import math

    from ..passes.shard import plan_sharded

    max_d = int(math.log2(num_devices))
    scores = {}
    for d in range(1, max_d + 1):
        try:
            if segmented:
                from . import prefetch as P

                plan = P.plan_prefetch(ops, n, num_global=d)
                secs, _ = estimate_plan_sharded(plan, n, d)
            else:
                plan = plan_sharded(ops, n, d, victim_policy=victim_policy,
                                    max_local_high=max_local_high)
                secs, _ = estimate_shard_plan(plan, n)
        except ValueError:
            continue
        scores[d] = secs
    if not scores:
        raise ValueError(f"no feasible mesh split for n={n} over "
                         f"{num_devices} devices")
    return min(scores, key=scores.get), scores
