"""Big-n virtual-mesh sharded execution (VERDICT r3 #3).

Runs the segmented recompile-free sharded engine
(parallel/sharded_prefetch.py) end-to-end at n=22..26 on an 8-virtual-CPU
'amp' mesh — the multi-chip execution path (gswap ppermute exchanges,
chunked scan chains, in-plan basis restore) at state sizes far past the
tests' n<=13, with device-side sampling straight off the sharded state.
Parity: engine-vs-engine differential against the single-device wide (mxu)
engine on the same backend, component-wise max|Δ|.

One physical TPU chip exists in this environment, so ICI perf cannot be
measured — this demonstrates CORRECTNESS + executability of the multi-chip
program at scale (the distributed generalization of the reference's
permute idea, quantum_simulator_preproces_permute.cu:388-413).  Timings
are recorded for completeness but are 1-core-host interpret-mode numbers,
not chip numbers.

Writes bench_artifacts/sharded_bign_cpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 1-core hosts serialize the 8 device threads; a deep chunk's compute
    # spread across participants can exceed XLA CPU's 40 s rendezvous abort
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["QSIM_NO_COMPILE_CACHE"] = "1"  # never persist CPU executables

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gpu_quantum_simulator_tpu import models  # noqa: E402
from gpu_quantum_simulator_tpu.config import SimulatorConfig  # noqa: E402
from gpu_quantum_simulator_tpu.engine.simulator import Simulator  # noqa: E402
from gpu_quantum_simulator_tpu.sampling import sample_state_device  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)

GATES = 2445  # the reference's deepest committed workload shape


def force(x):
    return float(np.asarray(x[:1])[0])


def main():
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, \
        (jax.default_backend(), len(jax.devices()))
    ns = [int(a) for a in sys.argv[1:]] or [22, 24, 26]
    budget = float(os.environ.get("QSIM_BIGN_BUDGET_S", 5400))
    t_start = time.perf_counter()
    records = []
    for n in ns:
        if time.perf_counter() - t_start > budget:
            records.append({"n": n, "skipped": "wall-clock budget"})
            continue
        c = models.grover_like(n, num_gates=GATES, seed=318)
        sh = Simulator(SimulatorConfig(
            strategy="sharded", shard_segmented=True, mesh_shape=(8,)))
        assert sh._shard_segmented(n), "segmented engine not routable"
        t0 = time.perf_counter()
        re_s, im_s, items = sh.run_device(c)
        force(re_s)
        cold = time.perf_counter() - t0
        print(f"n={n} sharded cold {cold:.1f}s items={items}", flush=True)
        t0 = time.perf_counter()
        re_s, im_s, items = sh.run_device(c)
        force(re_s); force(im_s)
        warm = time.perf_counter() - t0
        print(f"n={n} sharded warm {warm:.1f}s", flush=True)

        # device-side sampling on the still-sharded state
        samples = np.asarray(sample_state_device(re_s, im_s, n, 256, seed=3))
        uniq = int(len(np.unique(samples)))

        # engine-vs-engine differential: the wide (mxu) XLA engine on the
        # same backend; both resolve the same auto precision rung so the
        # difference is fusion/order rounding only
        mx = Simulator(SimulatorConfig(strategy="mxu"))
        t0 = time.perf_counter()
        re_m, im_m, _ = mx.run_device(c)
        force(re_m)
        mxu_s = time.perf_counter() - t0
        err = max(float(jax.numpy.max(jax.numpy.abs(re_s - re_m))),
                  float(jax.numpy.max(jax.numpy.abs(im_s - im_m))))
        norm = float(jax.numpy.sum(re_s * re_s) + jax.numpy.sum(im_s * im_s))
        print(f"n={n} parity vs mxu: max|Δcomp|={err:.2e} norm={norm:.8f} "
              f"(mxu {mxu_s:.1f}s)", flush=True)
        assert err < 2e-5, f"n={n} sharded-vs-mxu parity failed: {err}"
        assert abs(norm - 1.0) < 1e-3, norm
        records.append({
            "n": n, "gates": GATES, "mesh": "8-virtual-cpu-1core",
            "plan_items": int(items),
            "cold_seconds": round(cold, 1), "warm_seconds": round(warm, 1),
            "mxu_seconds": round(mxu_s, 1),
            "max_component_err_vs_mxu": err, "norm": norm,
            "device_samples": 256, "unique_outcomes": uniq,
        })
        del re_s, im_s, re_m, im_m
        with open(os.path.join(ART, "sharded_bign_cpu.json"), "w") as f:
            json.dump({"records": records}, f, indent=1)
    print(json.dumps({"records": records}), flush=True)
    print("DONE sharded_bign", flush=True)


if __name__ == "__main__":
    main()
