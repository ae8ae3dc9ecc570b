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

from gpu_quantum_simulator_tpu.engine import plancost as PC  # noqa: E402

US = PC.US
DISPATCH_S = PC.DISPATCH_S
tswap_us = PC.tswap_us

def calibrate(n_cal: int = 24, variant: str = "") -> bool:
    """Refresh the per-grid-step constants from the committed microbench
    JSONs (scripts/kernel_microbench.py output) when present; otherwise
    keep the documented estimates.  Returns True if measured data loaded.

    The microbench reports ms per block-chain entry; per-grid-step us =
    ms / gs * 1000 with gs = 2^(n-8) / T.  Step increments are taken from
    the widest multi-step entries (mat12, perm4, mono4) so the fixed pass
    overhead amortizes out of the per-step figure.
    """
    import json

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts")
    suffix = f"_{variant}" if variant else ""
    path = os.path.join(art, f"kernel_micro_n{n_cal}{suffix}.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        d = json.load(f)
    gs = (1 << (d["n"] - 8)) // d["T"]
    u = lambda ms: ms / gs * 1e3
    base = d["empty_pass_ms"]
    PC.BASE_PLAIN = u(base)
    if "mat12_ms" in d:
        PC.MAT = u(d["mat12_ms"] - base) / 12
    if "perm4_ms" in d:
        PC.PERM = u(d["perm4_ms"] - base) / 4
    if "mono4_ms" in d:
        PC.MONO = u(d["mono4_ms"] - base) / 4
    for key, k in (("tswap_k1_ms", 1), ("tswap_k4_ms", 4),
                   ("tswap_k5_ms", 5), ("tswap_k9_ms", 9)):
        if key in d:
            PC.TSWAP_PTS[k] = max(u(d[key] - base), 0.05)
    if "relayout_ms" in d:
        PC.RELAYOUT = u(d["relayout_ms"])
    if "xswap_prologue_ms" in d:
        PC.BASE_STEERED = u(d["xswap_prologue_ms"])
    ip = os.path.join(
        art, f"kernel_micro_n{n_cal}_inplace{suffix or ''}.json")
    if variant and not os.path.exists(ip):
        ip = os.path.join(art, f"kernel_micro_n{n_cal}_inplace.json")
    if os.path.exists(ip):
        with open(ip) as f:
            di = json.load(f)
        gsi = (1 << (di["n"] - 8)) // di["T"]
        PC.BASE_SPLIT = di["empty_pass_ms"] / gsi * 1e3
        if "xswap_pairgrid_ms" in di:
            PC.XSWAP_SPLIT = di["xswap_pairgrid_ms"] / gsi * 1e3
    return True


def estimate(plan: P.PrefetchPlan, n: int, inplace: bool = False,
             stream: bool = False):
    """(seconds, breakdown) — delegates to the package cost model
    (engine/plancost.py), which also drives the in-engine plan portfolio;
    calibrate() above refreshes its constants from committed microbenches."""
    return PC.estimate_plan(plan, n, inplace=inplace, stream=stream)


def estimate_sharded(plan: P.PrefetchPlan, n: int, d: int):
    """Delegates to plancost.estimate_plan_sharded (ICI gswap term)."""
    return PC.estimate_plan_sharded(plan, n, d)


def tune(ns):
    """Grid-search fusion/planner knobs against the calibrated model.

    Modeled time only — the winners are A/B CANDIDATES for the on-chip
    queue, not decisions.  Knobs: fusion window, fusion max_high, plan
    cap_mats."""
    for n in ns:
        c = circuits.grover_like(n)
        perm = plan_permutation(c)
        work = c.relabeled(perm)
        inplace = n >= 29
        rows = []
        for window in (4, 8, 12, 16):
            for max_high in (1, 2, 3):
                ops = _fuse_pipeline(work, min(7, n), max_high=max_high,
                                     window=window)
                for cap_mats in (2, 4, 8, P.CAP_MATS):
                    plan = P.plan_prefetch(
                        ops, n, final_layout=np.argsort(perm),
                        involution_relayout=inplace, cap_mats=cap_mats)
                    secs, _ = estimate(plan, n, inplace=inplace)
                    rows.append((secs, window, max_high, cap_mats,
                                 len(plan.blocks)))
        rows.sort()
        base = [r for r in rows
                if r[1] == 8 and r[2] == 2
                and r[3] == (4 if (n >= 21 and not inplace) else P.CAP_MATS)]
        print(f"n={n} default={base[0][0]:.3f}s" if base else f"n={n}",
              flush=True)
        for secs, window, max_high, cap_mats, blocks in rows[:5]:
            print(f"  est={secs:.3f}s window={window} max_high={max_high} "
                  f"cap_mats={cap_mats} blocks={blocks}", flush=True)


def main():
    # `--stream` calibrates from the kernel_micro_n24_stream.json pair
    # (the manual streaming kernels) once the queued A/B lands
    variant = "stream" if "--stream" in sys.argv else ""
    sys.argv = [a for a in sys.argv if a != "--stream"]
    fresh = calibrate(variant=variant)
    tag = f"measured kernel_micro_n24{'_' + variant if variant else ''}"
    print(f"calibration: {tag if fresh else 'builtin estimates'}"
          f"  base_plain={PC.BASE_PLAIN:.1f} base_split={PC.BASE_SPLIT:.1f}"
          f" mat={PC.MAT:.1f} mono={PC.MONO:.1f} perm={PC.PERM:.1f}"
          f" relayout={PC.RELAYOUT:.1f}"
          f" tswap(1/4/9)={tswap_us(1):.1f}/{tswap_us(4):.1f}/{tswap_us(9):.1f} us/gs",
          flush=True)
    if "--tune" in sys.argv:
        sys.argv.remove("--tune")
        tune([int(a) for a in sys.argv[1:]] or [24, 26, 29])
        return
    mesh_d = 0
    if "--mesh" in sys.argv:
        i = sys.argv.index("--mesh")
        mesh_d = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    ns = [int(a) for a in sys.argv[1:]] or [18, 22, 24, 26, 29, 30]
    for n in ns:
        c = circuits.grover_like(n)
        perm = plan_permutation(c)
        work = c.relabeled(perm)
        ops = _fuse_pipeline(work, min(7, n), max_high=2, window=8)
        if mesh_d:
            plan = P.plan_prefetch(
                ops, n, final_layout=np.argsort(perm), num_global=mesh_d)
            secs, acc = estimate_sharded(plan, n, mesh_d)
            comp = " ".join(
                f"{k}={v if isinstance(v, int) else round(v * US, 3) if k != 'gswap' else round(v, 3)}"
                for k, v in acc.items())
            print(f"n={n} mesh=2^{mesh_d} chips, nl={n - mesh_d} "
                  f"blocks={len(plan.blocks)} gswaps={plan.num_gswaps} "
                  f"est={secs:.3f}s  [{comp}]", flush=True)
            continue
        inplace = n >= 29
        # mirror the engine: portfolio planning above the width gate
        planner = (P.plan_prefetch_best if n >= P.PORTFOLIO_MIN_QUBITS
                   else P.plan_prefetch)
        plan = planner(
            ops, n, final_layout=np.argsort(perm),
            involution_relayout=inplace,
            cap_mats=(4 if (n >= 21 and not inplace) else P.CAP_MATS))
        secs, acc = estimate(plan, n, inplace=inplace, stream=bool(variant))
        comp = " ".join(f"{k}={v if isinstance(v, int) else round(v * US, 3)}"
                        for k, v in acc.items())
        print(f"n={n} inplace={inplace} blocks={len(plan.blocks)} "
              f"xswaps={plan.num_xswaps} relayouts={plan.num_relayouts} "
              f"est={secs:.3f}s  [{comp}]", flush=True)


if __name__ == "__main__":
    main()
