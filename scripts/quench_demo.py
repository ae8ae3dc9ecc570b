"""TFIM quench: entanglement growth + magnetization decay on device.

Physics showcase composing run_device_parts (device-resident stepping),
entanglement_entropy (reduced rho via MXU matmuls) and expectation_z:
|0...0> quenched under H = -J sum ZZ - g sum X, first-order Trotter.
Half-chain entropy grows ~linearly then saturates; <Z> decays — the
standard quench signature.  Usage: python scripts/quench_demo.py
[n] [steps] [dt] [measure_every].  Writes bench_artifacts/quench_demo.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    dt = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    every = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.observables import entanglement_entropy
    from gpu_quantum_simulator_tpu.sampling import expectation_z

    prefix, body, _ = models.trotter_tfim_parts(n, dt, J=1.0, g=1.0, steps=1)
    sim = Simulator(SimulatorConfig(strategy="mxu"))

    t0 = time.perf_counter()
    re, im, _ = sim.run_device(prefix)
    cut = min(n // 2, 12)
    times, entropies, mz = [], [], []
    for t in range(0, steps, every):
        re, im, _ = sim.run_device_parts(
            models.trotter_tfim(n, dt, steps=every), (re, im))
        times.append((t + every) * dt)
        entropies.append(entanglement_entropy(re, im, cut, n))
        mz.append(expectation_z(re, im, [n // 2], n))
        print(f"t={times[-1]:.2f}  S_half={entropies[-1]:.4f} bits  "
              f"<Z_mid>={mz[-1]:+.4f}", flush=True)
    total_s = time.perf_counter() - t0

    out = {
        "n": n, "steps": steps, "dt": dt, "cut": cut,
        "times": times, "entropy_bits": entropies, "mz_mid": mz,
        "total_s": total_s,
    }
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("times", "entropy_bits", "mz_mid")}),
          flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts", "quench_demo.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
