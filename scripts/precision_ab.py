"""On-chip accuracy/speed ladder for the MXU pass precision knob.

``SimulatorConfig.precision`` controls the f32 matmul lowering on TPU:
  highest — 6 bf16 passes (default; ~1e-7/gate, the parity bar)
  high    — 3 bf16 passes (half the MXU work of highest)
  default — 1 bf16 pass (amplitudes degrade ~1e-4/gate; CLAUDE.md)

Mat steps at ~5.2 us dominate dense blocks (kernel_micro_n24.json), so
``high`` should cut deep-circuit runtime meaningfully.  Sampling
workloads only need probabilities to ~1e-3, so the ladder is a real
user-facing trade — this measures both sides so docs/PERFORMANCE.md can
state it with numbers instead of estimates.

Per width: run the deep grover-profile circuit at each precision,
record median seconds and amplitude error vs the ``highest`` arm
(max|Δ| and the total-variation distance of the probability
distribution over the first 2^14 basis states — TVD is what sampling
accuracy actually depends on).  Timing is ``run_device`` + a one-scalar
force (the honest engine number): a ``run_detailed`` timing would bury
a 128 MB (n=24) tunnel D2H identically in every arm and halve the
relative signal (the diag24 lesson).

Writes bench_artifacts/precision_ab.json.
Usage: python scripts/precision_ab.py [n ...] (default 18 24) [cpu]
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

HEAD = 1 << 14   # amplitudes fetched for the error measures


def force(x):
    return float(np.asarray(x[:1])[0])


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [18, 24]
    out = {}
    for n in ns:
        c = models.grover_like(n)
        ref = None
        for prec in ("highest", "high", "default"):
            sim = Simulator(SimulatorConfig(strategy="prefetch",
                                            precision=prec))
            res = sim.run_detailed(c)   # warm-up: compile + plan + upload
            head = np.asarray(res.state[:HEAD])
            if ref is None:
                ref = head
                err = tvd = 0.0
            else:
                err = float(np.max(np.abs(head - ref)))
                tvd = float(0.5 * np.sum(np.abs(np.abs(head) ** 2
                                                - np.abs(ref) ** 2)))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                re, im, _ = sim.run_device(c)
                force(re)
                times.append(time.perf_counter() - t0)
                del re, im
            key = f"prefetch_n{n}_{prec}"
            out[key] = {"seconds": round(statistics.median(times), 4),
                        "max_amp_err": err, "head_tvd": tvd,
                        "ops": res.num_fused_ops}
            print(json.dumps({key: out[key]}), flush=True)
    with open(os.path.join(ART, "precision_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
