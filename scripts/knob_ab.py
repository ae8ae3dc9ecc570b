"""On-chip A/B of plan_model --tune candidates for the prefetch planner.

The offline model (calibrated to kernel_micro_n24.json) predicts
max_high=1 + cap_mats=12 beats the default max_high=2 + cap_mats=4 by
~14% at n=24 and ~12% at n=26 (fewer, fatter blocks).  This measures the
real end-to-end difference; the winner becomes the default only if it
wins on-chip.

Writes bench_artifacts/knob_ab.json.
Usage: python scripts/knob_ab.py [n ...] (default 24 26) [cpu]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" in sys.argv:
    sys.argv.remove("cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["QSIM_NO_COMPILE_CACHE"] = "1"

import numpy as np

from gpu_quantum_simulator_tpu import models
from gpu_quantum_simulator_tpu.config import SimulatorConfig
from gpu_quantum_simulator_tpu.engine.simulator import Simulator

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")

# Candidates from plan_model --tune under the ROUND-3 refreshed
# calibration (kernel_micro_n24.json, 2026-08-19): the old mh1_* rows
# stopped winning once measured mono/perm costs replaced the estimates;
# the model now picks window=16 + cap_mats=8 (-6%) and prices the
# QSIM_MONO_AS_MAT lowering (monomials as 3-matmul mat steps) at -13%
# at n=24 / -12% at n=26.  "mono" toggles PF.MONO_AS_MAT at runtime
# (run_prefetch keys its plan cache on it).
CANDIDATES = {
    "default": {},
    "w16_cm8": {"fusion_window": 16, "prefetch_cap_mats": 8},
    "mono_mat": {"mono": True},
    "mono_w16_cm8": {"mono": True, "fusion_window": 16,
                     "prefetch_cap_mats": 8},
}


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [24, 26]
    out = {}
    ref_state = {}
    for n in ns:
        c = models.grover_like(n)
        for name, kw in CANDIDATES.items():
            kw = dict(kw)
            from gpu_quantum_simulator_tpu.engine import prefetch as PF
            PF.MONO_AS_MAT = bool(kw.pop("mono", False))
            sim = Simulator(SimulatorConfig(strategy="prefetch", **kw))
            res = sim.run_detailed(c)   # warm-up: compile + plan
            # parity guard across candidates (first 64 amplitudes)
            head = np.asarray(res.state[:64])
            if n in ref_state:
                err = float(np.max(np.abs(head - ref_state[n])))
                assert err < 1e-5, (name, n, err)
            else:
                ref_state[n] = head
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                sim.run_detailed(c)
                times.append(time.perf_counter() - t0)
            key = f"prefetch_n{n}_{name}"
            out[key] = {"seconds": round(statistics.median(times), 4),
                        "ops": res.num_fused_ops}
            print(json.dumps({key: out[key]}), flush=True)
    with open(os.path.join(ART, "knob_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
