"""Randomized differential fuzz battery (beyond the suite's fixed seeds).

Three independent batteries, all hermetic (forced CPU; the sharded one
forces an 8-virtual-device platform and therefore must run in a fresh
process — it re-execs itself with the XLA flag set):

  engines   random circuits x all single-chip engines vs the f64
            reference, plus to_qasm -> parse_qasm round-trip identity
  sharded   monolithic + segmented sharded engines on a virtual mesh
  planner   plan_prefetch invariants across the knob grid (no execution):
            requested final layout honored, involution-restricted sigmas,
            step kinds in range
  density   random interleaved gate/channel streams vs dense Kraus algebra

Usage: python scripts/fuzz_battery.py [engines|sharded|planner|density|frontier|clifford|all]
                                      [trials] [seed]
Exit code != 0 on any failure.  The round-3 run (40/12+10/60 trials,
seed defaults) found zero engine/planner failures; the two bugs fuzzing
DID find (Circuit.compose(self) non-termination, Simon GF(2) recovery
order dependence) were in IR / classical post-processing and are pinned
by regression tests.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 0
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 318


def _init_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["QSIM_NO_COMPILE_CACHE"] = "1"


def fuzz_engines(trials: int, seed: int) -> int:
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu import models, parse_qasm
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    rng = np.random.default_rng(seed)
    strats = ["naive", "fused2x2", "fused4x4", "megakernel", "scan", "mxu",
              "vmem", "prefetch"]
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(4, 13))
        gates = int(rng.integers(20, 260))
        s0 = int(rng.integers(0, 10_000))
        c = models.random_circuit(n, gates, seed=s0)
        want = simulate_reference(c)
        if np.max(np.abs(want - simulate_reference(parse_qasm(c.to_qasm())))) > 1e-12:
            print("QASM ROUNDTRIP FAIL", n, gates, s0, flush=True)
            fails += 1
        picks = strats if trial % 4 == 0 else \
            [strats[int(rng.integers(len(strats)))]]
        for s in picks:
            try:
                got = Simulator(SimulatorConfig(strategy=s)).run(c)
                err = float(np.max(np.abs(got - want)))
                if err > 3e-5:
                    print("PARITY FAIL", s, n, gates, s0, err, flush=True)
                    fails += 1
            except Exception as e:  # noqa: BLE001 — report and count
                print("CRASH", s, n, gates, s0, repr(e)[:200], flush=True)
                fails += 1
    print(f"engines: {trials} circuits, fails = {fails}", flush=True)
    return fails


def fuzz_sharded(trials: int, seed: int) -> int:
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(10, 14))
        gates = int(rng.integers(60, 400))
        s0 = int(rng.integers(0, 10_000))
        c = models.random_circuit(n, gates, seed=s0)
        want = simulate_reference(c)
        for segmented in (False, True):
            try:
                got = Simulator(SimulatorConfig(
                    strategy="sharded", shard_segmented=segmented)).run(c)
                err = float(np.max(np.abs(got - want)))
                if err > 3e-5:
                    print("PARITY FAIL", segmented, n, gates, s0, err, flush=True)
                    fails += 1
            except Exception as e:  # noqa: BLE001
                print("CRASH", segmented, n, gates, s0, repr(e)[:200], flush=True)
                fails += 1
    print(f"sharded: {trials} circuits x 2 engines, fails = {fails}", flush=True)
    return fails


def fuzz_planner(trials: int, seed: int) -> int:
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.engine import prefetch as PF
    from gpu_quantum_simulator_tpu.engine.simulator import _fuse_pipeline

    rng = np.random.default_rng(seed)
    fails = checked = 0
    for _ in range(trials):
        n = int(rng.integers(9, 27))
        gates = int(rng.integers(30, 900))
        s0 = int(rng.integers(0, 10**6))
        c = models.random_circuit(n, gates, seed=s0)
        ops = _fuse_pipeline(c, min(7, n), max_high=int(rng.integers(1, 4)),
                             window=int(rng.choice([4, 8, 16])))
        final = (rng.permutation(n).astype(int) if rng.random() < 0.5
                 else np.arange(n))
        kwargs = dict(final_layout=final,
                      cap_mats=int(rng.choice([1, 2, 4, PF.CAP_MATS])),
                      involution_relayout=bool(rng.random() < 0.4),
                      lookahead_waves=int(rng.choice([0, 1, 3, 6])))
        try:
            plan = PF.plan_prefetch(ops, n, **kwargs)
        except ValueError as e:
            if "local qubits" in str(e) or "window" in str(e):
                continue
            print("CRASH", n, s0, kwargs, repr(e)[:200], flush=True)
            fails += 1
            continue
        if list(plan.final_position) != [int(p) for p in final]:
            print("LAYOUT FAIL", n, s0, kwargs, flush=True)
            fails += 1
        for b in plan.blocks:
            if kwargs["involution_relayout"] and b.relayout is not None:
                sg = np.asarray(b.relayout)
                if not np.array_equal(sg[sg], np.arange(len(sg))):
                    print("INVOLUTION FAIL", n, s0, flush=True)
                    fails += 1
            if any(not 0 <= k <= plan.logt + 2 for k in b.kinds):
                print("KIND FAIL", n, s0, flush=True)
                fails += 1
        checked += 1
    print(f"planner: {checked} plans checked, fails = {fails}", flush=True)
    return fails


def fuzz_density(trials: int, seed: int) -> int:
    """Random interleaved gate/channel streams vs dense Kraus algebra."""
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu import models
    from gpu_quantum_simulator_tpu.density import (
        NAMED_CHANNELS, Channel, DensitySimulator, NoisyCircuit)
    from gpu_quantum_simulator_tpu.ir.oplist import (
        expand_unitary, gate_op, op_matrix)

    rng = np.random.default_rng(seed)
    one_q = ["depolarizing", "dephasing", "bit_flip", "amplitude_damping"]
    fails = 0
    for _ in range(trials):
        n = int(rng.integers(2, 4))
        nc = NoisyCircuit(n)
        segs = int(rng.integers(2, 5))
        for _ in range(segs):
            c = models.random_circuit(n, int(rng.integers(5, 25)),
                                      seed=int(rng.integers(10_000)))
            nc.items.extend(c.gates)
            name = one_q[int(rng.integers(len(one_q)))]
            p = float(rng.uniform(0.05, 0.4))
            key = "gamma" if name == "amplitude_damping" else "p"
            nc.channel(name, int(rng.integers(n)), **{key: p})
        rho = np.zeros((1 << n, 1 << n), dtype=complex)
        rho[0, 0] = 1.0
        allq = tuple(range(n))
        for item in nc.items:
            if isinstance(item, Channel):
                acc = np.zeros_like(rho)
                for k in item.kraus:
                    big = expand_unitary(np.asarray(k), item.qubits, allq)
                    acc += big @ rho @ big.conj().T
                rho = acc
            else:
                u, qs = op_matrix(gate_op(item))   # little-endian sorted basis
                big = expand_unitary(u, qs, allq)
                rho = big @ rho @ big.conj().T
        got = DensitySimulator().run(nc).matrix()
        err = float(np.max(np.abs(got - rho)))
        if err > 3e-5:
            print("DENSITY FAIL", n, segs, err, flush=True)
            fails += 1
    print(f"density: {trials} noisy circuits, fails = {fails}", flush=True)
    return fails



def fuzz_frontier(trials: int, seed: int) -> int:
    """Random compositions of the synthesis surfaces (unitary 1-3q,
    pauli_rot, initialize, gphase/for-loop QASM) vs an INDEPENDENT dense
    matrix model built alongside — validates the decompositions
    themselves, not just engine cross-parity."""
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu import parse_qasm
    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ir.circuit import Circuit
    from gpu_quantum_simulator_tpu.ref.cpu import simulate_reference

    P1 = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
          "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}

    def expand(u, qubits, n):
        """Dense 2^n expansion of u over `qubits` (basis bit i = qubits[i])."""
        k = len(qubits)
        full = np.zeros((1 << n, 1 << n), dtype=complex)
        rest = [q for q in range(n) if q not in qubits]
        for col in range(1 << n):
            sub = sum(((col >> q) & 1) << i for i, q in enumerate(qubits))
            vout = u[:, sub]
            base = col
            for q in qubits:
                base &= ~(1 << q)
            for s in range(1 << k):
                row = base
                for i, q in enumerate(qubits):
                    row |= ((s >> i) & 1) << q
                full[row, col] += vout[s]
        return full

    def haar(rng, k):
        d = 1 << k
        z = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        q, r = np.linalg.qr(z)
        return q * (np.diag(r) / np.abs(np.diag(r)))

    rng = np.random.default_rng(seed)
    sim = Simulator(SimulatorConfig(strategy="mxu"))
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(2, 6))
        c = Circuit(n)
        model = np.eye(1 << n, dtype=complex)
        v0 = np.zeros(1 << n, dtype=complex)
        v0[0] = 1.0
        if rng.random() < 0.5:
            vec = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
            vec /= np.linalg.norm(vec)
            c.initialize(vec)
            v0 = vec.astype(complex)
        for _ in range(int(rng.integers(2, 7))):
            kind = rng.integers(0, 3)
            if kind == 0:       # haar unitary on 1-3 random qubits
                k = int(rng.integers(1, min(3, n) + 1))
                qs = tuple(int(q) for q in
                           rng.choice(n, size=k, replace=False))
                u = haar(rng, k)
                c.unitary(u, *qs)
                model = expand(u, qs, n) @ model
            elif kind == 1:     # pauli string rotation
                letters = "".join(rng.choice(list("IXYZ"), size=n))
                th = float(rng.uniform(-3, 3))
                c.pauli_rot(th, letters)
                pm = np.eye(1)
                for ch in reversed(letters):   # bit i = qubit i
                    pm = np.kron(pm, P1[ch])
                from scipy.linalg import expm
                model = expm(-0.5j * th * pm) @ model
            else:               # gphase via the QASM3 front-end
                g = float(rng.uniform(-3, 3))
                sub = parse_qasm(
                    f"OPENQASM 3;\nqubit[{n}] q;\ngphase({g!r});\n")
                c.gates.extend(sub.gates)
                model = np.exp(1j * g) * model
        want = model @ v0
        ref = simulate_reference(c)
        e_ref = float(np.max(np.abs(ref - want)))
        e_eng = float(np.max(np.abs(np.asarray(sim.run(c)) - want)))
        if e_ref > 1e-8 or e_eng > 1e-4:
            print("FRONTIER FAIL", trial, n, e_ref, e_eng, flush=True)
            fails += 1
    print(f"frontier: {trials} synthesis circuits, fails = {fails}",
          flush=True)
    return fails



def fuzz_clifford(trials: int, seed: int) -> int:
    """Random Clifford circuits: device sampler vs the exact CHP tableau
    (parity constraints bit-for-bit + per-qubit marginals) at widths the
    dense differential already covers — redundancy with a fully
    independent oracle."""
    _init_cpu()
    import numpy as np

    from gpu_quantum_simulator_tpu.config import SimulatorConfig
    from gpu_quantum_simulator_tpu.engine.simulator import Simulator
    from gpu_quantum_simulator_tpu.ref.stabilizer import (
        StabilizerState, random_clifford_circuit)

    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(4, 15))
        c = random_clifford_circuit(n, int(rng.integers(30, 300)),
                                    seed=int(rng.integers(10_000)))
        st = StabilizerState.from_circuit(c)
        strat = "mxu" if rng.random() < 0.5 else "prefetch"
        sim = Simulator(SimulatorConfig(strategy=strat))
        s = np.asarray(sim.sample(c, 2000, seed=trial))
        bad = 0
        for mask, parity in st.z_parity_constraints():
            pc = np.array([bin(int(v) & mask).count("1") % 2 for v in s])
            bad += int(np.sum(pc != parity))
        for q in range(n):
            p1 = float(np.mean((s >> q) & 1))
            if abs(p1 - (1 - st.expectation_z([q])) / 2) > 0.06:
                bad += 1
        if bad:
            print("CLIFFORD FAIL", trial, n, strat, bad, flush=True)
            fails += 1
    print(f"clifford: {trials} circuits, fails = {fails}", flush=True)
    return fails


def main() -> None:
    # the sharded battery needs the virtual 8-device platform, which must
    # be set before jax initializes — re-exec once with the flag in place
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        sys.exit(subprocess.call([sys.executable, os.path.abspath(__file__)]
                                 + sys.argv[1:], env=env))
    defaults = {"engines": 40, "sharded": 10, "planner": 60, "density": 20,
                "frontier": 30, "clifford": 20}
    fails = 0
    for mode, fn in (("engines", fuzz_engines), ("sharded", fuzz_sharded),
                     ("planner", fuzz_planner), ("density", fuzz_density),
                     ("frontier", fuzz_frontier), ("clifford", fuzz_clifford)):
        if MODE in (mode, "all"):
            fails += fn(TRIALS or defaults[mode], SEED)
    print("FUZZ BATTERY DONE, total fails =", fails, flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
