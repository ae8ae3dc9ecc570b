"""Where does the n>=24 prefetch wall-clock actually go? — real chip.

The knob/stream A/Bs timed ``run_detailed``, which ends with a FULL-state
D2H fetch (``np.asarray(re)``) through the 0.16-1 GB/s axon tunnel —
128 MB at n=24, 512 MB at n=26 — while the mxu numbers they were compared
against (fusion_ab.json) timed ``run_device`` + a one-scalar force.  This
script separates, per width and per arm (grid / fold):

  exec    run_device + force one scalar     (the honest engine number)
  fetch   np.asarray of both components     (tunnel D2H, not engine)
  full    run_detailed                      (what the A/Bs measured)
  chunks  per-chain-part dispatch timings   (sync after every part)

Writes bench_artifacts/diag24.json.
Usage: python scripts/diag24.py [n ...] (default 24 26) [cpu]
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
from gpu_quantum_simulator_tpu.ops.apply import initial_state_parts

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")


def force(x):
    return float(np.asarray(x[:1])[0])


def median3(f):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [24, 26]
    out = {}
    for n in ns:
        c = models.grover_like(n)
        arms = [("grid", False, "prefetch"), ("fold", True, "prefetch")]
        if n <= 26:
            # same split for the wide engine: the n=24 mxu-vs-prefetch
            # story must compare exec to exec, not exec to exec+fetch
            arms.append(("mxu", False, "mxu"))
        for arm, fold, strategy in arms:
            PF._STREAM_RELAYOUT = fold
            sim = Simulator(SimulatorConfig(strategy=strategy))
            re, im, nops = sim.run_device(c)   # cold: compile+plan+upload
            force(re)
            del re, im

            def exec_once():
                re, im, _ = sim.run_device(c)
                force(re)
                exec_once.last = (re, im)

            rec = {"ops": nops, "exec_s": median3(exec_once)}
            re, im = exec_once.last

            rec["fetch_s"] = median3(lambda: (np.asarray(re), np.asarray(im)))
            rec["full_s"] = median3(lambda: sim.run_detailed(c))

            # per-chain-part dispatch costs: rebuild via the run cache and
            # drive the parts by hand with a sync after each
            prog = None
            if strategy == "prefetch":
                for p in PF._RUN_CACHE.values():
                    if p.num_qubits == n and not p.inplace:
                        prog = p
            if prog is not None and not prog.inplace:
                r, i = initial_state_parts(n, dtype=np.float32)
                chunks = []
                for chain, scal, a_tab, b_tab in prog._chain_parts:
                    t0 = time.perf_counter()
                    r, i = chain(r, i, scal, a_tab, b_tab, prog._ptab)
                    force(r)
                    chunks.append(round(time.perf_counter() - t0, 4))
                rec["chunks_s"] = chunks
                rec["chunk_entries"] = [int(s.shape[0])
                                        for _, s, _, _ in prog._chain_parts]
                del r, i
            key = f"n{n}_{arm}"
            out[key] = rec
            print(json.dumps({key: rec}), flush=True)
        PF._STREAM_RELAYOUT = False
    with open(os.path.join(ART, "diag24.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
