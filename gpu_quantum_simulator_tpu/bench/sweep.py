"""Benchmark sweep — the tester.bash equivalent.

The reference sweeps 9 binaries over random circuits at n=5..22, 5 runs each,
appending raw seconds to OverallTest.csv (tester.bash:8-48).  This module
reproduces that protocol against this library's strategies and writes both
the same CSV shape and a structured JSONL record per run.

Usage:
    python -m gpu_quantum_simulator_tpu.bench.sweep --strategies mxu scan \
        --min-qubits 5 --max-qubits 22 --runs 5 --out sweep.csv
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List

from ..config import STRATEGIES, SimulatorConfig
from ..engine.simulator import Simulator
from ..models import grover_like


def run_sweep(
    strategies: List[str],
    min_qubits: int,
    max_qubits: int,
    runs: int,
    num_gates: int = 2445,
    seed: int = 318,
    csv_path: str = "OverallTest.csv",
    jsonl_path: str = "sweep.jsonl",
) -> None:
    csv_f = open(csv_path, "a")
    jsonl_f = open(jsonl_path, "a")
    try:
        for strategy in strategies:
            csv_f.write(f"{strategy}:\n")
            sim = Simulator(SimulatorConfig(strategy=strategy))
            for n in range(min_qubits, max_qubits + 1):
                csv_f.write(f"Num QBit {n}:\n")
                circuit = grover_like(n, num_gates=num_gates, seed=seed)
                sim.run_detailed(circuit)  # warm-up (compile)
                for r in range(runs):
                    t0 = time.perf_counter()
                    res = sim.run_detailed(circuit)
                    dt = time.perf_counter() - t0
                    csv_f.write(f"{dt:.6f}\n")
                    jsonl_f.write(
                        json.dumps(
                            {
                                "strategy": strategy,
                                "num_qubits": n,
                                "num_gates": res.num_gates,
                                "num_fused_ops": res.num_fused_ops,
                                "run": r,
                                "seconds": dt,
                            }
                        )
                        + "\n"
                    )
                    csv_f.flush()
                    jsonl_f.flush()
                print(f"{strategy} n={n}: last {dt:.4f}s", file=sys.stderr)
    finally:
        csv_f.close()
        jsonl_f.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--strategies", nargs="+", default=["mxu"], choices=STRATEGIES)
    p.add_argument("--min-qubits", type=int, default=5)
    p.add_argument("--max-qubits", type=int, default=22)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--num-gates", type=int, default=2445)
    p.add_argument("--out", default="OverallTest.csv")
    p.add_argument("--jsonl", default="sweep.jsonl")
    args = p.parse_args(argv)
    run_sweep(
        args.strategies,
        args.min_qubits,
        args.max_qubits,
        args.runs,
        num_gates=args.num_gates,
        csv_path=args.out,
        jsonl_path=args.jsonl,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
