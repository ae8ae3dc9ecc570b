"""Produce the committed benchmark-sweep artifacts (BASELINE.md goal:
reproduce the reference's OverallTest.csv record, tester.bash:8-48).

Per-strategy qubit ranges reflect what is *worth measuring* on the target:
the reference similarly capped its CPU binary at n=18 while the CUDA
binaries ran to n=22 (tester.bash:12,21).  Dispatch-per-gate strategies
(naive/fused2x2/...) are bounded by the host-link round-trip (~30 ms per
dispatch through the axon tunnel), not by n — their sections document that
cost exactly like the reference's naive section documents launch overhead.

Writes bench/artifacts/OverallTest_v5e.csv + sweep_v5e.jsonl.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_quantum_simulator_tpu.bench.sweep import run_sweep  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
os.makedirs(ART, exist_ok=True)
CSV = os.path.join(ART, "OverallTest_v5e.csv")
JSONL = os.path.join(ART, "sweep_v5e.jsonl")

# (strategies, min_n, max_n, runs)
SECTIONS = [
    (["reference"], 5, 14, 3),
    (["naive"], 5, 8, 2),
    (["fused3in1"], 5, 8, 2),
    (["fused2x2"], 5, 10, 2),
    (["fused4x4"], 5, 10, 2),
    (["scan"], 5, 14, 3),
    (["megakernel"], 5, 14, 3),
    (["vmem"], 8, 18, 3),
    (["mxu"], 5, 20, 5),
    (["prefetch"], 5, 24, 5),
]

if __name__ == "__main__":
    only = sys.argv[1:] or None
    for strategies, lo, hi, runs in SECTIONS:
        if only and strategies[0] not in only:
            continue
        print(f"=== {strategies[0]} n={lo}..{hi} x{runs}", flush=True)
        run_sweep(strategies, lo, hi, runs, csv_path=CSV, jsonl_path=JSONL)
    print("sweep artifacts written to", ART, flush=True)
