"""Benchmark sweep — the tester.bash equivalent.

The reference sweeps 9 binaries over random circuits at n=5..22, 5 runs each,
appending raw seconds to OverallTest.csv (tester.bash:8-48).  This module
reproduces that protocol against this library's strategies and writes both
the same CSV shape and a structured JSONL record per run.

Two timing columns (VERDICT r3 #5):

- ``full``  — the tester.bash protocol: run + fetch the WHOLE state to host
  (run_detailed).  Honest end-to-end, but for n >= 23 the 2^n * 8 B device->
  host copy over the dev tunnel (~15-22 MB/s) dominates and the row measures
  the tunnel, not the chip.
- ``exec``  — state stays device-resident (run_device); completion is forced
  by fetching ONE scalar amplitude.  This is the column that lets every
  strategy reach its honest ceiling (the reference's own sweep never leaves
  the GPU either — tester.bash times the binary, which prints, not copies).

Usage:
    python -m gpu_quantum_simulator_tpu.bench.sweep --strategies mxu scan \
        --min-qubits 5 --max-qubits 22 --runs 5 --timing exec full --out sweep.csv
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List

import numpy as np

from ..config import STRATEGIES, SimulatorConfig
from ..engine.simulator import Simulator
from ..models import grover_like


def _force(x) -> None:
    """Force completion of a device array without a full D2H copy.

    block_until_ready can return early through the tunnel (async dispatch);
    fetching ONE scalar is the reliable completion barrier (CLAUDE.md).
    """
    np.asarray(x[:1])


def run_sweep(
    strategies: List[str],
    min_qubits: int,
    max_qubits: int,
    runs: int,
    num_gates: int = 2445,
    seed: int = 318,
    csv_path: str = "OverallTest.csv",
    jsonl_path: str = "sweep.jsonl",
    timing: List[str] = ("full",),
) -> None:
    csv_f = open(csv_path, "a")
    jsonl_f = open(jsonl_path, "a")

    def record(strategy, mode, n, r, dt, gates, fused):
        csv_f.write(f"{dt:.6f}\n")
        jsonl_f.write(
            json.dumps(
                {
                    "strategy": strategy,
                    "timing": mode,
                    "num_qubits": n,
                    "num_gates": gates,
                    "num_fused_ops": fused,
                    "run": r,
                    "seconds": dt,
                }
            )
            + "\n"
        )
        csv_f.flush()
        jsonl_f.flush()

    try:
        for strategy in strategies:
            for mode in timing:
                section = strategy if mode == "full" else f"{strategy} (exec)"
                csv_f.write(f"{section}:\n")
                sim = Simulator(SimulatorConfig(strategy=strategy))
                for n in range(min_qubits, max_qubits + 1):
                    csv_f.write(f"Num QBit {n}:\n")
                    circuit = grover_like(n, num_gates=num_gates, seed=seed)
                    try:
                        if mode == "full":
                            sim.run_detailed(circuit)  # warm-up (compile)
                            for r in range(runs):
                                t0 = time.perf_counter()
                                res = sim.run_detailed(circuit)
                                dt = time.perf_counter() - t0
                                record(strategy, mode, n, r, dt,
                                       res.num_gates, res.num_fused_ops)
                        else:
                            re, im, fused = sim.run_device(circuit)
                            _force(re)  # warm-up (compile)
                            for r in range(runs):
                                t0 = time.perf_counter()
                                re, im, fused = sim.run_device(circuit)
                                _force(re)
                                _force(im)
                                dt = time.perf_counter() - t0
                                record(strategy, mode, n, r, dt,
                                       len(circuit), fused)
                            del re, im
                    except Exception as e:  # OOM / watchdog: record the ceiling
                        jsonl_f.write(json.dumps({
                            "strategy": strategy, "timing": mode,
                            "num_qubits": n, "error": repr(e)[:300],
                        }) + "\n")
                        jsonl_f.flush()
                        print(f"{section} n={n}: CEILING {e!r}",
                              file=sys.stderr)
                        break
                    print(f"{section} n={n}: last {dt:.4f}s", file=sys.stderr)
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
    p.add_argument(
        "--timing", nargs="+", default=["full"], choices=["full", "exec"],
        help="timing columns: full = run + whole-state D2H (tester.bash "
        "protocol); exec = device-resident, one-scalar completion barrier",
    )
    args = p.parse_args(argv)
    run_sweep(
        args.strategies,
        args.min_qubits,
        args.max_qubits,
        args.runs,
        num_gates=args.num_gates,
        csv_path=args.out,
        jsonl_path=args.jsonl,
        timing=args.timing,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
