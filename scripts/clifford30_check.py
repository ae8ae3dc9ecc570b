"""Independent large-n validation: a random Clifford circuit at n=29/30
through the in-place split-state engine, with every device sample checked
against the exact CHP tableau predictions (ref/stabilizer.py).

This is the ground truth the dense f64 reference cannot provide past
n~26: the tableau predicts per-qubit marginals (each exactly 0, 1/2, or
1), all pairwise <Z_a Z_b> (each exactly -1, 0, +1), and the Z-parity
constraints every ideal sample must satisfy bit-for-bit.

Usage: python scripts/clifford30_check.py [n=30] [gates=4000] [shots=4096]
Writes bench_artifacts/clifford{n}_check.json; exit 1 on any violation.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    gates = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    shots = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from gpu_quantum_simulator_tpu import Simulator, SimulatorConfig
    from gpu_quantum_simulator_tpu.ref.stabilizer import (
        StabilizerState, random_clifford_circuit)
    from gpu_quantum_simulator_tpu.sampling import sample_halves

    circ = random_clifford_circuit(n, gates, seed=318)

    t0 = time.perf_counter()
    st = StabilizerState.from_circuit(circ)
    cons = st.z_parity_constraints()
    marg = [st.expectation_z([q]) for q in range(n)]
    rng = np.random.default_rng(7)
    pair_idx = [(int(a), int(b)) for a, b in
                (rng.choice(n, size=2, replace=False) for _ in range(64))]
    pairs = [(a, b, st.expectation_z([a, b])) for a, b in pair_idx]
    t_tab = time.perf_counter() - t0

    sim = Simulator(SimulatorConfig(strategy="prefetch",
                                    prefetch_inplace=True))
    t0 = time.perf_counter()
    parts, num_ops = sim.run_device_halves(circ)
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    samples = np.asarray(sample_halves(*parts, n, shots, seed=11))
    t_sample = time.perf_counter() - t0

    # popcount parity per sample (vectorized over 64-bit ints)
    def parity_of(vals, mask):
        x = (vals & mask).astype(np.uint64)
        p = np.zeros_like(x)
        while np.any(x):
            p ^= x & np.uint64(1)
            x >>= np.uint64(1)
        return p.astype(np.int64)

    bad_parity = 0
    for mask, parity in cons:
        viol = int(np.sum(parity_of(samples, mask) != parity))
        bad_parity += viol

    # marginal / pair estimates: binomial tolerance ~5 sigma
    tol = 5.0 / np.sqrt(shots)
    bad_marg = []
    for q in range(n):
        p1 = float(np.mean((samples >> q) & 1))
        want = (1 - marg[q]) / 2
        if abs(p1 - want) > tol:
            bad_marg.append((q, p1, want))
    bad_pairs = []
    for a, b, ez in pairs:
        za = 1 - 2 * ((samples >> a) & 1)
        zb = 1 - 2 * ((samples >> b) & 1)
        est = float(np.mean(za * zb))
        if abs(est - ez) > 2 * tol:
            bad_pairs.append((a, b, est, ez))

    ok = bad_parity == 0 and not bad_marg and not bad_pairs
    rec = {
        "n": n, "gates": gates, "shots": shots, "num_fused_ops": num_ops,
        "z_constraints": len(cons),
        "tableau_s": round(t_tab, 3), "run_s": round(t_run, 2),
        "sample_s": round(t_sample, 2),
        "parity_violations": bad_parity,
        "bad_marginals": bad_marg[:5], "bad_pairs": bad_pairs[:5],
        "ok": ok,
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts",
        f"clifford{n}_check.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
