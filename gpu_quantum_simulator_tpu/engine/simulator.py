"""Simulator facade: one library, a strategy knob per reference ablation."""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import SimulatorConfig
from ..ir.circuit import Circuit
from ..ops import apply as A
from .. import ref as REF


@dataclass
class RunResult:
    state: np.ndarray          # final complex amplitudes, ORIGINAL qubit basis
    num_qubits: int
    num_gates: int
    num_fused_ops: int
    seconds: float             # wall-clock: passes + execution + D2H
    strategy: str


_UNPERMUTE = None


def _unpermute_jit(re, im, perm_tuple):
    global _UNPERMUTE
    if _UNPERMUTE is None:
        import jax

        _UNPERMUTE = jax.jit(A.unpermute_device, static_argnums=(2,))
    return _UNPERMUTE(re, im, perm_tuple)


def _auto_strategy(cfg: SimulatorConfig, n: int) -> str:
    """Width-based engine dispatch for ``strategy='auto'``.

    Encodes the measured single-chip ladder (bench_artifacts/
    sweep_v5e.jsonl, docs/PERFORMANCE.md): the recompile-free prefetch
    engine is fastest through n=22 and is the only engine with an
    in-place path at n >= 29.  In the 23..28 band the round-5 re-base
    under shipped auto-precision defaults (bench_artifacts/diag24.json:
    prefetch-fold exec 1.69/7.23 s vs mxu 1.81/7.93 s at n=24/26) shows
    prefetch wins exec-to-exec, but mxu keeps the band because this
    environment's end-to-end includes the dev-tunnel D2H, which runs 2x
    faster on the mxu output path (full n=24: 6.1 vs 10.3 s) — on
    PCIe-class hosts flip the band to prefetch.  An explicit device mesh
    always means the sharded engine (the reference's multi-GPU analog,
    spread over ICI instead of NVLink).
    """
    if cfg.mesh_shape is not None:
        return "sharded"
    if 23 <= n <= 28:
        return "mxu"
    return "prefetch"


class Simulator:
    def __init__(self, config: Optional[SimulatorConfig] = None):
        self.config = config or SimulatorConfig()

    def _resolved(self, n: int) -> "Simulator":
        """Resolve ``strategy='auto'`` to a concrete engine for width n."""
        if self.config.strategy != "auto":
            return self
        import dataclasses

        return Simulator(dataclasses.replace(
            self.config, strategy=_auto_strategy(self.config, n)))

    # ------------------------------------------------------------------ API
    def run(self, circuit: Circuit, initial=None) -> np.ndarray:
        return self.run_detailed(circuit, initial=initial).state

    def sample(self, circuit: Circuit, num_samples: int, seed: int = 0) -> np.ndarray:
        """Measurement sampling (ref: quantum_simulator.c:256-283).

        For n > 22 the distribution, CDF and inverse-CDF search run on the
        device (sampling.py) — the 2^n state is never transferred.
        """
        sim = self._resolved(circuit.num_qubits)
        if sim is not self:
            return sim.sample(circuit, num_samples, seed=seed)
        if circuit.num_qubits > 22 and self.config.strategy != "reference":
            if self._prefetch_inplace(circuit.num_qubits):
                from ..sampling import sample_halves

                parts, _ = self.run_device_halves(circuit)
                return sample_halves(*parts, circuit.num_qubits, num_samples, seed)
            from ..sampling import sample_state_device

            re, im, _ = self.run_device(circuit)
            return sample_state_device(re, im, circuit.num_qubits, num_samples, seed)
        state = self.run(circuit)
        return REF.sample(state, num_samples, np.random.default_rng(seed))

    def run_device(self, circuit: Circuit, initial=None):
        """Run and return DEVICE-resident (re, im) in the original basis.

        The big-n API: nothing of size 2^n crosses the device boundary; use
        sampling.py helpers (sample/top-k/norm) for measurement results.

        ``initial``: optional complex state vector (original basis) to resume
        from — e.g. a utils.checkpoint snapshot — instead of |0...0>.
        """
        sim = self._resolved(circuit.num_qubits)
        if sim is not self:
            return sim.run_device(circuit, initial=initial)
        cfg = self.config
        perm = None
        work = circuit
        # prefetch is absent: it relabels internally and routes the state
        # back to the ORIGINAL basis inside its own plan (near-free in-plan
        # steps vs one ~30 ms tunnel dispatch per bit transposition here);
        # same for the segmented sharded engine
        if self._shard_segmented(circuit.num_qubits):
            pass
        elif cfg.permute or cfg.strategy in ("mxu", "pallas", "vmem", "sharded"):
            from ..passes.permute import plan_permutation

            perm = plan_permutation(circuit)
            if np.array_equal(perm, np.arange(circuit.num_qubits)):
                perm = None
            else:
                work = circuit.relabeled(perm)

        initial_parts = None
        if initial is not None:
            iv = np.asarray(initial)
            if iv.shape != (1 << circuit.num_qubits,):
                raise ValueError("initial state has wrong length")
            if perm is not None:
                from ..passes.permute import unpermute_state

                # map original-basis amplitudes into the relabeled basis
                iv = unpermute_state(iv, np.argsort(perm))
            initial_parts = (
                np.ascontiguousarray(iv.real),
                np.ascontiguousarray(iv.imag),
            )

        re, im, num_ops, residual = self._execute(work, initial_parts)

        # Compose the relabeling with any layout the engine left behind, and
        # undo both with one on-device transpose (the reference's permute
        # variants skip this and return a scrambled basis — defect #7).
        total = None
        if perm is not None and residual is not None:
            total = residual[perm]
        elif perm is not None:
            total = perm
        elif residual is not None:
            total = residual
        if total is not None and not np.array_equal(total, np.arange(circuit.num_qubits)):
            re, im = _unpermute_jit(re, im, tuple(int(p) for p in total))
        return re, im, num_ops

    def run_device_parts(self, circuit: Circuit, parts):
        """Execute on DEVICE-RESIDENT (re, im) parts, returning device parts.

        The layout-closed program path: no qubit relabeling, input and
        output both in the original basis, and nothing of size 2^n ever
        crosses the device boundary — the building block for dynamic-
        circuit trajectories (dynamic.py) where measurements interleave
        with unitary segments on a live device state.  Programs come from
        the same caches as run_device_iterated, so repeated trajectories
        re-execute with zero re-planning or re-compilation.
        """
        sim = self._resolved(circuit.num_qubits)
        if sim is not self:
            return sim.run_device_parts(circuit, parts)
        import jax.numpy as jnp

        real_dtype = _init_real_dtype(self.config)
        fn, nops = self._build_program(circuit, real_dtype)
        re = jnp.asarray(parts[0], dtype=real_dtype)
        im = jnp.asarray(parts[1], dtype=real_dtype)
        re, im = fn(re, im)
        return re, im, nops

    def _shard_segmented(self, n: int) -> bool:
        """Route 'sharded' through the segmented recompile-free engine?"""
        cfg = self.config
        if cfg.strategy != "sharded":
            return False
        if cfg.dtype != "complex64":
            return False
        from ..parallel.mesh import make_mesh, num_global_qubits

        axis = cfg.mesh_axis_names[0]
        d = num_global_qubits(make_mesh(cfg.mesh_shape, cfg.mesh_axis_names),
                              axis)
        from .prefetch import MIN_QUBITS

        if n - d < MIN_QUBITS:
            return False
        if cfg.shard_segmented is not None:
            return bool(cfg.shard_segmented)
        return True

    def _prefetch_inplace(self, n: int) -> bool:
        cfg = self.config
        if cfg.strategy != "prefetch":
            return False
        if cfg.prefetch_inplace is not None:
            return bool(cfg.prefetch_inplace)
        return n >= 30

    def run_device_halves(self, circuit: Circuit, initial_parts=None):
        """Run via the in-place prefetch engine and return the state as the
        four (R2, 128) column-half arrays: ``((re0, re1, im0, im1), nops)``.

        The split form is the native large-n representation: at n=30 a flat
        2^n join needs one contiguous 4.3 GB block the post-run heap cannot
        always provide, while every measurement helper
        (``sampling.sample_halves`` / ``norm_halves``) consumes the halves
        directly.  Original qubit basis, as always.  ``initial_parts``
        resumes from a prior state: either a flat (re, im) pair or the
        four column halves (``utils.checkpoint.load_state_halves``).
        """
        sim = self._resolved(circuit.num_qubits)
        if sim is not self:
            return sim.run_device_halves(circuit, initial_parts=initial_parts)
        if not self._prefetch_inplace(circuit.num_qubits):
            raise ValueError(
                "run_device_halves requires strategy='prefetch' with the "
                "in-place engine (prefetch_inplace=True or n >= 30)")
        from .prefetch import run_prefetch

        parts, _, num_ops, _ = run_prefetch(
            circuit, self.config, initial_parts=initial_parts,
            return_halves=True)
        parts[0].block_until_ready()
        return parts, num_ops

    def run_device_iterated(
        self,
        body: Circuit,
        repetitions: int,
        prefix: Optional[Circuit] = None,
        suffix: Optional[Circuit] = None,
    ):
        """Run ``prefix; body^repetitions; suffix`` compiling each part ONCE.

        Structured deep circuits (Grover iterations, Trotter steps, QAOA
        layers) repeat one block many times; compiling the unrolled circuit
        costs `repetitions` times more than compiling the block.  Here the
        body program is built once and iterated over device-resident state
        (one ~0.5 ms dispatch per repetition).  All parts share one qubit
        relabeling so no basis shuffling happens between repetitions.

        Supported strategies: the program-building ones (mxu, vmem,
        megakernel, sharded, prefetch).  Returns device (re, im) in the
        original basis.  For ``sharded``, every part is planned
        layout-closed (passes.shard restore_layout) so repetitions compose
        on the mesh.  For ``prefetch``, the body is planned layout-closed
        (final_layout = identity) and all repetitions run as ONE device
        dispatch (engine.prefetch.iterate_program) — the recompile-free
        engine's executables are reused across every iteration AND every
        later circuit at the same width.
        """
        sim = self._resolved(body.num_qubits)
        if sim is not self:
            return sim.run_device_iterated(
                body, repetitions, prefix=prefix, suffix=suffix)
        cfg = self.config
        if cfg.strategy not in ("mxu", "vmem", "megakernel", "sharded",
                                "prefetch"):
            raise ValueError(
                f"run_device_iterated supports mxu/vmem/megakernel/sharded/"
                f"prefetch, not {cfg.strategy!r}"
            )
        n = body.num_qubits
        for part in (prefix, suffix):
            if part is not None and part.num_qubits != n:
                raise ValueError("all parts must have the same qubit count")

        # one relabeling across all parts (usage summed)
        perm = None
        if cfg.permute or cfg.strategy in ("mxu", "vmem", "sharded", "prefetch"):
            from ..passes.permute import plan_permutation

            merged = Circuit(n)
            for part in (prefix, body, suffix):
                if part is not None:
                    merged.gates.extend(part.gates)
            perm = plan_permutation(merged)
            if np.array_equal(perm, np.arange(n)):
                perm = None

        def relabel(part):
            if part is None or perm is None:
                return part
            return part.relabeled(perm)

        real_dtype = _init_real_dtype(cfg)
        re, im = A.initial_state_parts(n, dtype=real_dtype)
        if cfg.strategy == "sharded":
            from ..parallel.sharded import ShardedProgram

            probe = ShardedProgram(Circuit(n), self.config)
            re, im = probe.init_state()
        total_ops = 0
        for part, reps in (
            (relabel(prefix), 1),
            (relabel(body), repetitions),
            (relabel(suffix), 1),
        ):
            if part is None or reps == 0:
                continue
            fn, nops = self._build_program(part, real_dtype)
            total_ops += nops * reps
            if reps > 1 and cfg.strategy == "mxu" and hasattr(fn, "pure_chain"):
                # loop ON DEVICE: one dispatch and one compile for all
                # repetitions (per-dispatch latency otherwise dominates)
                re, im = _scan_program(fn, reps)(re, im)
            elif reps > 1 and cfg.strategy == "prefetch" and hasattr(
                    fn, "_chain_parts"):
                from .prefetch import iterate_program

                re, im = iterate_program(fn, reps)(re, im)
            else:
                for _ in range(reps):
                    re, im = fn(re, im)

        if perm is not None:
            re, im = _unpermute_jit(re, im, tuple(int(p) for p in perm))
        return re, im, total_ops

    def _build_program(self, circuit: Circuit, real_dtype):
        """(compiled (re,im)->(re,im) program, num_ops) for program strategies."""
        cfg = self.config
        n = circuit.num_qubits
        if cfg.strategy == "megakernel" or n <= 7:
            from ..passes.fuse4x4 import fuse_4x4
            from .megakernel import build_megakernel

            ops = fuse_4x4(circuit) if cfg.strategy == "megakernel" else (
                _fuse_pipeline(circuit, min(cfg.max_fused_qubits, n), max_high=None)
            )
            return build_megakernel(ops, n, real_dtype), len(ops)
        if cfg.strategy == "vmem":
            import jax

            from .vmem import VMEM_MAX_QUBITS, build_vmem_program_cached

            if n > VMEM_MAX_QUBITS:
                raise ValueError(f"vmem requires n <= {VMEM_MAX_QUBITS}")
            ops = _fuse_pipeline(circuit, min(cfg.max_fused_qubits, 7), max_high=2)
            interp = jax.default_backend() != "tpu"
            return build_vmem_program_cached(ops, n, real_dtype, interp), len(ops)
        if cfg.strategy == "sharded":
            if self._shard_segmented(n):
                from ..parallel.mesh import make_mesh
                from ..parallel.sharded_prefetch import ShardedPrefetchProgram
                from .prefetch import LANE_QUBITS

                mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
                ops = _fuse_pipeline(
                    circuit, min(cfg.max_fused_qubits, LANE_QUBITS),
                    max_high=2, window=8)
                # final_layout = identity: layout-closed, repetitions compose
                prog = ShardedPrefetchProgram(
                    ops, n, mesh, cfg.mesh_axis_names[0],
                    precision=cfg.effective_precision(n),
                    final_layout=np.arange(n))
                return prog, prog.num_ops
            from ..parallel.sharded import ShardedProgram

            # layout-closed plan: repetitions compose with no residual
            prog = ShardedProgram(circuit, cfg, restore_layout=True)
            return prog, len(prog.plan.items)
        if cfg.strategy == "prefetch":
            from .prefetch import LANE_QUBITS, MIN_QUBITS, build_prefetch_program

            if cfg.dtype != "complex64":
                raise ValueError("prefetch is float32-only")
            if n < MIN_QUBITS:
                from ..passes.fuse4x4 import fuse_4x4
                from ..passes.fuse_k import fuse_k
                from .megakernel import build_megakernel

                ops = fuse_k(fuse_4x4(circuit),
                             max_qubits=min(cfg.max_fused_qubits, n))
                return build_megakernel(ops, n, real_dtype), len(ops)
            from .prefetch import resolve_prefetch_knobs

            max_high, cap_mats, window = resolve_prefetch_knobs(cfg, n, False)
            ops = _fuse_pipeline(
                circuit, min(cfg.max_fused_qubits, LANE_QUBITS),
                max_high=max_high, window=window)
            reorder = (cfg.prefetch_reorder
                       if cfg.prefetch_reorder is not None else True)
            # layout-closed: the plan routes the state back to the identity
            # layout, so repeated applications compose in the original basis
            prog = build_prefetch_program(
                ops, n, real_dtype, precision=cfg.effective_precision(n),
                cap_mats=cap_mats,
                final_layout=np.arange(n), reorder=reorder)
            return prog, prog.num_ops
        # mxu — same cost-model window-8 default as _execute
        from .wide import build_wide_program

        window = cfg.fusion_window if cfg.fusion_window else 8
        costm = (cfg.fusion_cost_model
                 if cfg.fusion_cost_model is not None else True)
        ops = _fuse_pipeline(circuit, min(cfg.max_fused_qubits, n), max_high=2,
                             window=window, cost_model=costm)
        return build_wide_program(
            ops, n, real_dtype,
            precision=cfg.effective_precision(n)), len(ops)

    def run_many(self, circuits, terms=None, throttle: int = 8):
        """Pipelined batch execution: dispatch EVERY circuit before fetching
        any result, so per-circuit link latency overlaps device execution —
        with the recompile-free engines (prefetch, segmented sharded) the
        dispatch loop is pure table-upload + enqueue.

        ``terms=None``: returns a list of host state vectors.
        ``terms=[(coeff, pauli), ...]``: returns an np.ndarray of <H> per
        circuit — only scalars ever cross the device boundary (the batch
        screening pattern: same observable, many candidate circuits).
        ``throttle``: block every k dispatches — async dispatch pins every
        queued op's inputs, so an unthrottled loop holds all tables live.
        """
        import jax

        circuits = list(circuits)
        if not circuits:
            return [] if terms is None else np.zeros(0)
        eval_terms = None
        if terms is not None:
            widths = {c.num_qubits for c in circuits}
            if len(widths) != 1:
                raise ValueError(
                    f"terms mode needs equal widths, got {sorted(widths)}")
            n = widths.pop()
            from ..observables import _parse_pauli, apply_pauli_parts

            parsed, const = [], 0.0
            for coeff, pauli in terms:
                ops = _parse_pauli(pauli, n)
                if ops:
                    parsed.append((float(coeff), ops))
                else:
                    const += float(coeff)

            @jax.jit
            def eval_terms(re, im):
                import jax.numpy as jnp

                total = jnp.zeros((), re.dtype)
                for coeff, ops in parsed:
                    tr, ti = apply_pauli_parts(re, im, ops, n)
                    total = total + coeff * (jnp.vdot(re, tr)
                                             + jnp.vdot(im, ti))
                return total

        pending = []
        for i, c in enumerate(circuits):
            re, im, _ = self.run_device(c)
            pending.append(eval_terms(re, im) if eval_terms is not None
                           else (re, im))
            if throttle and (i + 1) % throttle == 0:
                last = pending[-1]
                jax.block_until_ready(
                    last if eval_terms is not None else last[0])
        if eval_terms is not None:
            return np.asarray([float(v) for v in pending]) + const
        return [np.asarray(re) + 1j * np.asarray(im) for re, im in pending]

    def run_detailed(self, circuit: Circuit, initial=None) -> RunResult:
        sim = self._resolved(circuit.num_qubits)
        if sim is not self:
            return sim.run_detailed(circuit, initial=initial)
        cfg = self.config
        t0 = time.perf_counter()

        if cfg.strategy == "reference":
            state = REF.simulate_reference(circuit, initial=initial)
            return RunResult(
                state, circuit.num_qubits, len(circuit), len(circuit),
                time.perf_counter() - t0, cfg.strategy,
            )

        re, im, num_ops = self.run_device(circuit, initial=initial)
        state = A.join_state(np.asarray(re), np.asarray(im))

        return RunResult(
            state, circuit.num_qubits, len(circuit), num_ops,
            time.perf_counter() - t0, cfg.strategy,
        )

    # ------------------------------------------------------------- dispatch
    def _execute(self, circuit: Circuit, initial_parts=None):
        import jax.numpy as jnp

        cfg = self.config
        real_dtype = _init_real_dtype(cfg)
        n = circuit.num_qubits
        if n > 30 and cfg.strategy != "sharded":
            # fail BEFORE allocating: a 2^31 state is past the single-chip
            # ceiling (n = 30 fits 16 GB HBM only as split halves) and the
            # attempt would thrash for minutes first
            raise ValueError(
                f"n = {n} exceeds the single-chip ceiling (n = 30); use "
                "strategy='sharded' over a multi-chip mesh")
        # pallas/prefetch/sharded construct their own start state (prefetch
        # builds column halves directly); pre-allocating a flat 2^n pair
        # here would hold 8.6 GB of dead buffers through an n=30 run
        if cfg.strategy in ("pallas", "prefetch", "sharded"):
            re = im = None
        elif initial_parts is not None:
            re = jnp.asarray(initial_parts[0], dtype=real_dtype)
            im = jnp.asarray(initial_parts[1], dtype=real_dtype)
        else:
            re, im = A.initial_state_parts(n, dtype=real_dtype)

        residual = None

        if cfg.strategy == "naive":
            from .naive import run_naive

            re, im = run_naive(circuit, re, im, real_dtype)
            num_ops = len(circuit)

        elif cfg.strategy == "fused2x2":
            from ..passes.fuse2x2 import fuse_2x2
            from .naive import run_oplist

            ops = fuse_2x2(circuit)
            re, im = run_oplist(ops, n, re, im, real_dtype)
            num_ops = len(ops)

        elif cfg.strategy == "fused3in1":
            from .naive import run_3in1

            re, im = run_3in1(circuit, re, im, real_dtype)
            num_ops = len(circuit)

        elif cfg.strategy == "fused4x4":
            from ..passes.fuse4x4 import fuse_4x4
            from .naive import run_oplist

            ops = fuse_4x4(circuit)
            re, im = run_oplist(ops, n, re, im, real_dtype)
            num_ops = len(ops)

        elif cfg.strategy == "megakernel":
            from ..passes.fuse4x4 import fuse_4x4
            from .megakernel import build_megakernel

            ops = fuse_4x4(circuit)
            re, im = build_megakernel(ops, n, real_dtype)(re, im)
            num_ops = len(ops)

        elif cfg.strategy == "scan":
            from ..passes.fuse2x2 import fuse_2x2
            from .scan import run_scan

            ops = fuse_2x2(circuit)
            re, im = run_scan(ops, n, re, im, bucket=cfg.scan_bucket)
            num_ops = len(ops)

        elif cfg.strategy == "mxu":
            from ..passes.fuse4x4 import fuse_4x4
            from ..passes.fuse_k import fuse_k

            # 4x4 pairing first (cheap, removes structural cx), then widen to
            # MXU-sized dense blocks.
            k = min(cfg.max_fused_qubits, n)
            if n > 7:
                import jax

                from .prefetch import _circuit_fingerprint
                from .wide import build_wide_program

                # default: cost-model window-8 fusion — measured -28% at
                # n=18 / -17% at n=24 vs window-1 first-fit
                # (bench_artifacts/fusion_ab.json)
                window = cfg.fusion_window if cfg.fusion_window else 8
                costm = (cfg.fusion_cost_model
                         if cfg.fusion_cost_model is not None else True)
                # Plan cache: re-running a circuit must not re-fuse it or
                # re-hash every fused matrix (together ~0.35 s host time on
                # the 2445-gate benchmark — 3x the n=18 device time).  The
                # gate-stream fingerprint is cached on the circuit, so a
                # repeat run goes straight to the compiled program — the
                # same repeated-execution economics the prefetch engine's
                # _RUN_CACHE established.
                key = (_circuit_fingerprint(circuit), n, cfg.dtype,
                       cfg.effective_precision(n), k, window, costm,
                       jax.default_backend())
                cached = _MXU_PLAN_CACHE.get(key)
                if cached is None:
                    ops = _fuse_pipeline(circuit, k, max_high=2,
                                         window=window, cost_model=costm)
                    prog = build_wide_program(
                        ops, n, real_dtype,
                        precision=cfg.effective_precision(n))
                    if len(_MXU_PLAN_CACHE) >= _MXU_PLAN_CACHE_LIMIT:
                        _MXU_PLAN_CACHE.pop(next(iter(_MXU_PLAN_CACHE)))
                    _MXU_PLAN_CACHE[key] = (ops, prog)
                else:
                    ops, prog = cached
                re, im = prog(re, im)
            else:
                from .megakernel import build_megakernel

                ops = _fuse_pipeline(circuit, k, max_high=None)
                re, im = build_megakernel(ops, n, real_dtype)(re, im)
            num_ops = len(ops)

        elif cfg.strategy == "pallas":
            from .pallas_engine import run_pallas

            re, im, num_ops, residual = run_pallas(
                circuit, self.config, initial_parts=initial_parts
            )

        elif cfg.strategy == "prefetch":
            from .prefetch import run_prefetch

            re, im, num_ops, residual = run_prefetch(
                circuit, self.config, initial_parts=initial_parts
            )

        elif cfg.strategy == "vmem":
            import jax

            from .vmem import VMEM_MAX_QUBITS, build_vmem_program_cached

            if n <= 7:
                from ..passes.fuse_k import fuse_k
                from ..passes.fuse4x4 import fuse_4x4
                from .megakernel import build_megakernel

                ops = fuse_k(fuse_4x4(circuit), max_qubits=n)
                re, im = build_megakernel(ops, n, real_dtype)(re, im)
            else:
                if n > VMEM_MAX_QUBITS:
                    raise ValueError(
                        f"vmem strategy holds the state in VMEM: n <= "
                        f"{VMEM_MAX_QUBITS} (got {n}); use mxu"
                    )
                from .prefetch import _circuit_fingerprint

                # same repeat-run economics as the mxu plan cache: skip
                # re-fusing and re-hashing the fused matrices on a repeat
                interp = jax.default_backend() != "tpu"
                key = ("vmem", _circuit_fingerprint(circuit), n, cfg.dtype,
                       cfg.max_fused_qubits, interp)
                cached = _MXU_PLAN_CACHE.get(key)
                if cached is None:
                    ops = _fuse_pipeline(circuit, min(cfg.max_fused_qubits, 7),
                                         max_high=2)
                    prog = build_vmem_program_cached(ops, n, real_dtype, interp)
                    if len(_MXU_PLAN_CACHE) >= _MXU_PLAN_CACHE_LIMIT:
                        _MXU_PLAN_CACHE.pop(next(iter(_MXU_PLAN_CACHE)))
                    _MXU_PLAN_CACHE[key] = (ops, prog)
                else:
                    ops, prog = cached
                re, im = prog(re, im)
            num_ops = len(ops)

        elif cfg.strategy == "sharded":
            if self._shard_segmented(n):
                from ..parallel.sharded_prefetch import run_sharded_prefetch

                re, im, num_ops, residual = run_sharded_prefetch(
                    circuit, self.config, initial_parts=initial_parts
                )
            else:
                from ..parallel.sharded import run_sharded

                re, im, num_ops, residual = run_sharded(
                    circuit, self.config, initial_parts=initial_parts
                )

        else:  # pragma: no cover
            raise AssertionError(cfg.strategy)

        re.block_until_ready()
        return re, im, num_ops, residual


def _init_real_dtype(cfg: SimulatorConfig):
    """Resolve cfg.dtype to the real component dtype, enabling x64 if needed."""
    import jax
    import jax.numpy as jnp

    if cfg.dtype == "complex128":
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    return jnp.float32


def _scan_program(prog, reps: int):
    """Wrap a WideProgram in an on-device lax.scan over `reps` applications.

    Compiled once per (program, reps); cached on the program object (which
    build_wide_program itself caches by op-list fingerprint).
    """
    cache = getattr(prog, "_scan_cache", None)
    if cache is None:
        cache = prog._scan_cache = {}
    entry = cache.get(reps)
    if entry is not None:
        return entry

    import jax

    fn_pure, mats = prog.pure_chain()

    @jax.jit
    def scanned(re, im, *mat_args):
        def step(carry, _):
            r, i = carry
            return fn_pure(r, i, *mat_args), None

        (re, im), _ = jax.lax.scan(step, (re, im), None, length=reps)
        return re, im

    fn = lambda re, im: scanned(re, im, *mats)
    cache[reps] = fn
    return fn


# mxu plan cache: (circuit fingerprint, n, dtype, precision, fusion knobs,
# backend) -> (fused ops, compiled WideProgram).  Entries hold fused
# matrices (tens of MB at n=18 depths), so the limit stays small.
_MXU_PLAN_CACHE: dict = {}
_MXU_PLAN_CACHE_LIMIT = 8

_NATIVE_FUSE = None  # tri-state: None unknown, False unavailable, module


def _fuse_pipeline(circuit: Circuit, max_qubits: int, max_high, window: int = 1,
                   cost_model: bool = False):
    """fuse_4x4 + fuse_k, via the native C++ pipeline when available.

    ``window`` > 1 enables the commutation-aware packing in the native
    emitter (csrc/qsim_fuse.cpp).  The prefetch engine uses window=8 (every
    op costs one uniform 256-matmul there, so fewer ops is a pure win:
    measured -16%% ops/swaps/blocks on the deep workload).

    ``cost_model``: wide-engine mode — split low/high caps (a block may hold
    max_qubits low PLUS max_high high qubits; its device cost depends only
    on kh) and kh-cost-aware absorb-candidate selection calibrated from the
    measured per-op-class rooflines (utils.roofline.kh_block_costs).  This
    is what makes window > 1 profitable for the wide engine: plain first-fit
    packing shifted the kh mix toward 4x-cost D=512 blocks (round-1
    regression 0.21 -> 0.37 s).
    """
    global _NATIVE_FUSE
    if _NATIVE_FUSE is None:
        try:
            from ..passes import native_fuse as nf

            _NATIVE_FUSE = nf if nf.available() else False
        except Exception:
            _NATIVE_FUSE = False
    # The native fuser requires max_qubits >= 2 (csrc/qsim_fuse.cpp rejects
    # smaller); clamping is harmless since fused blocks never exceed n qubits.
    max_qubits = max(2, max_qubits)
    if _NATIVE_FUSE:
        if cost_model and max_high is not None:
            from ..utils.roofline import kh_block_costs

            return _NATIVE_FUSE.fuse_native(
                circuit, max_qubits, max_high, window=window,
                max_low=max_qubits,
                kh_costs=kh_block_costs(circuit.num_qubits),
            )
        return _NATIVE_FUSE.fuse_native(circuit, max_qubits, max_high, window=window)
    from ..passes.fuse4x4 import fuse_4x4
    from ..passes.fuse_k import fuse_k

    if cost_model and max_high is not None:
        return fuse_k(fuse_4x4(circuit), max_qubits=max_qubits,
                      max_high=max_high, max_low=max_qubits)
    return fuse_k(fuse_4x4(circuit), max_qubits=max_qubits, max_high=max_high)


def simulate(circuit: Circuit, strategy: str = "mxu", **kwargs) -> np.ndarray:
    """One-shot convenience: final state in the original basis."""
    return Simulator(SimulatorConfig(strategy=strategy, **kwargs)).run(circuit)
