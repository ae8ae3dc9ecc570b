"""Large-n scaling benchmark: past the reference's ceiling.

The reference's largest demonstrated run is n=22 (4x4 variant, 51.68 s
median, OverallTest.csv); its CPU baseline stops at n=18.  This sweep runs
the grover-profile workload at n = 24..30 on one TPU chip with device-side
measurement sampling (no 2^n transfer), printing one JSON line per n.

    python -m gpu_quantum_simulator_tpu.bench.scale --max-qubits 30
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def run_one(n: int, num_gates: int, runs: int, strategy: str, samples: int):
    from ..config import SimulatorConfig
    from ..engine.simulator import Simulator
    from ..models import grover_like
    from ..sampling import norm_device, sample_state_device

    circuit = grover_like(n, num_gates=num_gates, seed=318)
    sim = Simulator(SimulatorConfig(strategy=strategy))

    # warm-up: compile
    re, im, num_ops = sim.run_device(circuit)
    float(norm_device(re, im))

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        re, im, num_ops = sim.run_device(circuit)
        s = sample_state_device(re, im, n, samples, seed=1)
        times.append(time.perf_counter() - t0)
    norm = float(norm_device(re, im))

    # roofline accounting (SURVEY §5: report achieved fraction of the
    # hardware bound; BASELINE.md targets >= 80% at the kernel level)
    from ..passes.permute import plan_permutation
    from ..engine.simulator import _fuse_pipeline
    from ..utils.roofline import wide_program_cost

    work = circuit.relabeled(plan_permutation(circuit))
    ops = _fuse_pipeline(work, 7, max_high=2)
    cost = wide_program_cost(ops, n)
    med = statistics.median(times)
    return {
        "metric": "grover_profile_scale",
        "num_qubits": n,
        "num_gates": num_gates,
        "num_fused_ops": num_ops,
        "seconds_median": round(med, 4),
        "roofline_seconds": round(cost.seconds(), 4),
        "roofline_fraction": round(cost.seconds() / med, 4),
        "arithmetic_intensity_flop_per_byte": round(cost.arithmetic_intensity, 2),
        "runs": runs,
        "samples": samples,
        "norm": round(norm, 6),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--min-qubits", type=int, default=24)
    p.add_argument("--max-qubits", type=int, default=30)
    p.add_argument("--step", type=int, default=2)
    p.add_argument("--num-gates", type=int, default=2445)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--strategy", default="mxu")
    args = p.parse_args(argv)
    for n in range(args.min_qubits, args.max_qubits + 1, args.step):
        try:
            rec = run_one(n, args.num_gates, args.runs, args.strategy, args.samples)
            print(json.dumps(rec), flush=True)
        except Exception as exc:  # OOM etc.: report and continue
            print(json.dumps({"num_qubits": n, "error": str(exc)[:200]}), flush=True)
            print(f"n={n} failed: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
