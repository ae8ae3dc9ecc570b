"""On-chip A/B of the streamed-input relayout fold (QSIM_STREAM_RELAYOUT).

Arms, per width, on one deep grover-profile circuit:
  grid    — Mosaic-pipelined grid block kernel (current default)
  stream  — manual W-deep streaming DMA kernel, standalone relayouts
  fold    — streaming kernel + relayout folded into the next plain
            block's Tr-granular input copies (docs/ROADMAP.md note 1)

The fold removes one full state round-trip AND one forced block boundary
per foldable relayout (129 relayouts at n=24, ~2.1 ops/block), at the
price of T/Tr-times more input DMA issues on the folded blocks — exactly
the trade scripts/dma_probe.py prices (hbmTr64 vs hbmTr512).  This is the
end-to-end answer.

Arms toggle module flags in ONE process; kernel/chain/run caches key on
the flags, so no cross-arm reuse.  Writes
bench_artifacts/stream_relayout_ab.json.
Usage: python scripts/stream_relayout_ab.py [n ...] (default 22 24) [cpu]
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

ARMS = {
    "grid": (False, False),
    "stream": (True, False),
    "fold": (False, True),
}


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [22, 24]
    out = {}
    for n in ns:
        c = models.grover_like(n)
        ref_head = None
        for name, (plain, fold) in ARMS.items():
            PF._STREAM_PLAIN, PF._STREAM_RELAYOUT = plain, fold
            sim = Simulator(SimulatorConfig(strategy="prefetch"))
            res = sim.run_detailed(c)   # warm-up: compile + plan + upload
            head = np.asarray(res.state[:64])
            if ref_head is None:
                ref_head = head
            else:
                err = float(np.max(np.abs(head - ref_head)))
                assert err < 1e-5, (name, n, err)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                sim.run_detailed(c)
                times.append(time.perf_counter() - t0)
            # plan-structure counters for the record: how many relayouts
            # the plan emitted and how many the chain actually folded
            key = f"prefetch_n{n}_{name}"
            out[key] = {"seconds": round(statistics.median(times), 4),
                        "ops": res.num_fused_ops}
            print(json.dumps({key: out[key]}), flush=True)
    PF._STREAM_PLAIN = PF._STREAM_RELAYOUT = False
    with open(os.path.join(ART, "stream_relayout_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
