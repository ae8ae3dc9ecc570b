"""Offline plan cost model: estimate device time of a prefetch plan from
the measured per-step kernel costs (bench_artifacts/kernel_micro_n24.json,
measured at n=24, T=512, grid=128) so planner changes can be evaluated
without the TPU in the loop.

Per-grid-step costs (us), n=24 calibration:
  base (steered 4-stream)   10.4   empty pass, halves + concat
  base (plain 2-stream)      6.0   ESTIMATE until measured on-chip
  mat                        5.2   3 Karatsuba 256-wide matmuls
  perm (p_tab dot pair)      3.5   ESTIMATE (2/3 mat) until measured
  tswap(k)                   1.76 + 0.675*(k-1)
  relayout pass             10.9   pure-DMA block permutation (1.395 ms/pass)

Usage: python scripts/plan_model.py [n ...]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["QSIM_NO_COMPILE_CACHE"] = "1"

import numpy as np  # noqa: E402

from gpu_quantum_simulator_tpu.models import circuits  # noqa: E402
from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline  # noqa: E402
from gpu_quantum_simulator_tpu.engine import prefetch as P  # noqa: E402
from gpu_quantum_simulator_tpu.passes.permute import plan_permutation  # noqa: E402

US = 1e-6
BASE_STEERED = 10.4
BASE_PLAIN = 6.0
BASE_SPLIT = 8.0     # in-place 4-stream halves-native kernel (ESTIMATE)
MAT = 5.2
PERM = 3.5
MONO = 3.7    # monomial op: one gather matmul + VPU phase rotation (EST)
RELAYOUT = 10.9
DISPATCH_S = 0.030        # per chain part over the axon tunnel


def tswap_us(k: int) -> float:
    return 1.76 + 0.675 * (k - 1)


def estimate(plan: P.PrefetchPlan, n: int, inplace: bool = False):
    """(seconds, breakdown dict) for one plan at width n."""
    T = P.tile_rows(n)
    gs = max((1 << (n - P.LOCAL_QUBITS)) // T, 1)
    logt = plan.logt
    acc = {"base": 0.0, "mat": 0.0, "mono": 0.0, "tswap": 0.0, "perm": 0.0,
           "relayout": 0.0, "xswap": 0.0}
    for b in plan.blocks:
        if b.relayout is not None:
            acc["relayout"] += RELAYOUT * gs
            continue
        if b.gswap is not None:
            continue
        if inplace and b.prologue is not None:
            # materialization hoists the prologue into a standalone
            # pair-grid swap entry (half grid) + a plain step block
            acc["xswap"] += BASE_PLAIN * gs / 2
            acc["base"] += BASE_SPLIT * gs
            for kind in b.kinds:
                if kind == 0:
                    acc["mat"] += MAT * gs
                elif kind == logt + 1:
                    acc["perm"] += PERM * gs
                elif kind == logt + 2:
                    acc["mono"] += MONO * gs
                else:
                    acc["tswap"] += tswap_us(kind) * gs
            continue
        acc["base"] += (BASE_SPLIT if inplace else
                        BASE_STEERED if b.prologue is not None
                        else BASE_PLAIN) * gs
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
    grid_rows = gs
    max_chunk = max(32, P.DISPATCH_GRID_BUDGET // grid_rows)
    nparts = len(P._chunks(len(plan.blocks), max_chunk))
    total += nparts * DISPATCH_S
    acc["dispatch_parts"] = nparts
    return total, acc


def main():
    ns = [int(a) for a in sys.argv[1:]] or [18, 22, 24, 26, 29, 30]
    for n in ns:
        c = circuits.grover_like(n)
        perm = plan_permutation(c)
        work = c.relabeled(perm)
        ops = _fuse_pipeline(work, min(7, n), max_high=2, window=8)
        inplace = n >= 29
        plan = P.plan_prefetch(
            ops, n, final_layout=np.argsort(perm),
            involution_relayout=inplace,
            cap_mats=(4 if (n >= 21 and not inplace) else P.CAP_MATS))
        secs, acc = estimate(plan, n, inplace=inplace)
        comp = " ".join(f"{k}={v if isinstance(v, int) else round(v * US, 3)}"
                        for k, v in acc.items())
        print(f"n={n} inplace={inplace} blocks={len(plan.blocks)} "
              f"xswaps={plan.num_xswaps} relayouts={plan.num_relayouts} "
              f"est={secs:.3f}s  [{comp}]", flush=True)


if __name__ == "__main__":
    main()
