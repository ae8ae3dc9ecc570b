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

# Measured 2026-08-19 (knob_ab.log, grover_like): mono+w16+cm8 won n=24
# 18.91 -> 11.06 s (n=26 ~neutral) and became the n >= 21 flat default;
# perm-as-mat measured NEGATIVE (17.57 / 22.60 s) and stays off.  The
# arms below regression-check the flip: "default" = the new auto knobs,
# "round2" = the pre-flip configuration, "mono_off" isolates the mono
# lowering under the new window/cap, "monoperm" re-checks the rejected
# perm lowering against the current default.
CANDIDATES = {
    "default": {},
    "round2": {"mono": False, "fusion_window": 8, "prefetch_cap_mats": 4},
    "mono_off": {"mono": False},
    "monoperm": {"perm": True},
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
            # None = the engine's auto default (mono ON at n >= 21 flat
            # since the 2026-08-19 flip); True/False force an arm
            mono = kw.pop("mono", None)
            PF.MONO_AS_MAT = None if mono is None else bool(mono)
            PF.PERM_AS_MAT = bool(kw.pop("perm", False))
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
