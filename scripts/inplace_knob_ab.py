"""Knob + precision A/B for the LARGE-n engines — real chip.

The n >= 21 flat planner defaults (mono-as-mat, window=16, cap_mats=8)
were measured on the flat engine only; the in-place halves chains
(n >= 29-30) still run the old defaults pending their own A/B
(resolve_mono_as_mat / resolve_prefetch_knobs).  Separately, mat steps
are MXU-bound at HIGHEST (6 bf16 passes; kernel_micro_n24_inplace.json:
~0.93 ms marginal per mat vs a 0.33 ms HBM bound), so the 3-pass "high"
rung should cut mat-dominated block time ~2x at an amplitude cost of
~1e-6 per ~600 gates (measured on chip 2026-08-19).

Arms (each: cold incl. plan/compile/upload, then 2 timed warm runs,
scalar-force fetch):
  n=29 flat     high            vs the committed 76.7 s highest demo
  n=30 in-place knobs           (w16 + cap8 + mono-as-mat, highest)
  n=30 in-place knobs+high      (same + precision=high)

Baselines already committed: n29_demo.json 76.7 s, n30_demo.json 156.9 s.
Writes bench_artifacts/inplace_knob_ab.json incrementally after each arm.
Usage: python scripts/inplace_knob_ab.py [arm ...] (default all three:
n29high n30knobs n30knobshigh) [cpu]
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
from gpu_quantum_simulator_tpu.engine import prefetch as PF
from gpu_quantum_simulator_tpu.engine.simulator import Simulator

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
OUT = os.path.join(ART, "inplace_knob_ab.json")

# small-n stand-ins under 'cpu' so the script itself is smoke-testable
SMALL = os.environ.get("QSIM_AB_SMALL")
N_FLAT = 12 if SMALL else 29
N_IP = 13 if SMALL else 30


def force(x):
    return float(np.asarray(x[:1])[0])


ARMS = {
    "n29high": (N_FLAT, dict(strategy="prefetch", precision="high"), False),
    "n30knobs": (N_IP, dict(strategy="prefetch", prefetch_inplace=True,
                            fusion_window=16, prefetch_cap_mats=8), True),
    "n30knobshigh": (N_IP, dict(strategy="prefetch", prefetch_inplace=True,
                                fusion_window=16, prefetch_cap_mats=8,
                                precision="high"), True),
}


def main() -> None:
    names = [a for a in sys.argv[1:] if a in ARMS] or list(ARMS)
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    for name in names:
        n, kw, inplace = ARMS[name]
        PF.MONO_AS_MAT = True if inplace else None  # in-place arms force it
        c = models.grover_like(n, num_gates=2445, seed=n)
        sim = Simulator(SimulatorConfig(**kw))

        if inplace:  # n=30 state only exists as split column halves
            def run_once():
                parts, k = sim.run_device_halves(c)
                force(parts[0][:, 0])
                return parts, k
        else:
            def run_once():
                re, im, k = sim.run_device(c)
                force(re)
                return (re, im), k

        t0 = time.perf_counter()
        parts, nops = run_once()
        cold = time.perf_counter() - t0
        if inplace:
            from gpu_quantum_simulator_tpu.sampling import norm_halves

            norm = round(float(norm_halves(*parts)), 8)
        else:
            from gpu_quantum_simulator_tpu.sampling import norm_device

            norm = round(float(norm_device(*parts)), 8)
        del parts
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            parts, _ = run_once()
            ts.append(time.perf_counter() - t0)
            del parts
        PF.MONO_AS_MAT = None
        out[name] = {"n": n, "ops": nops, "cold_s": round(cold, 1),
                     "warm_s": round(statistics.median(ts), 2),
                     "runs": [round(t, 2) for t in ts], "norm": norm}
        print(json.dumps({name: out[name]}), flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
