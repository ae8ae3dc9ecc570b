"""Complete the committed per-strategy sweep record (VERDICT round-2 #4).

Extends bench_artifacts/OverallTest_v5e.csv + sweep_v5e.jsonl to each
strategy's real ceiling under the reference's tester.bash protocol (warm-up
+ 5 timed runs of the full pipeline incl. D2H), and records an explicit
per-strategy ceiling + reason in bench_artifacts/sweep_ceilings.json so the
artifact has no silent truncation.

Run in stages (remote compiles serialize):
    python scripts/sweep_fill.py stage1   # cheap dispatch-bound strategies
    python scripts/sweep_fill.py stage2   # mxu 21-24, prefetch 21-26
    python scripts/sweep_fill.py stage3   # vmem 16-18 (compile-heavy)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_quantum_simulator_tpu.bench.sweep import run_sweep  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_artifacts")
CSV = os.path.join(ART, "OverallTest_v5e.csv")
JSONL = os.path.join(ART, "sweep_v5e.jsonl")

# Per-strategy ladder TARGETS and the reason each ladder stops where it
# does.  These are intent, not evidence: the committed
# bench_artifacts/sweep_ceilings.json is GENERATED from sweep_v5e.jsonl
# (derive_ceilings below) so its recorded_* fields can never claim more
# than the JSONL contains (round-4 verdict, "What's weak" #1).
# "target_max_n" is the FULL-pipeline (tester.bash protocol incl. D2H)
# target — for n >= 23 those rows measure the dev tunnel's 15-22 MB/s D2H,
# not the chip.  "target_exec_max_n" is the exec-only column (state
# device-resident, one-scalar completion fetch), which lets the
# dispatch-bound ablations reach the reference's own n=22 grid
# (tester.bash:8-48) honestly.
TARGETS = {
    "reference": {"target_max_n": 18, "reason": "CPU float64 oracle; "
                  "~minutes/run beyond n=18 adds no information (ref CPU "
                  "row: 899 s)"},
    "naive": {"target_max_n": 10, "target_exec_max_n": 22, "reason":
              "full rows stop at 10 (launch-per-gate + D2H is all "
              "overhead); exec ladder targets the reference grid — ~1.9 "
              "s/run at n=10 (2445 pipelined dispatches), chip time grows "
              "past n~20"},
    "fused2x2": {"target_max_n": 12, "target_exec_max_n": 22, "reason":
                 "per-flush dispatch-bound (~700 flushes); exec ladder "
                 "targets the reference grid"},
    "fused3in1": {"target_max_n": 10, "target_exec_max_n": 22, "reason":
                  "dispatch-bound (3-in-1 grouped flushes); exec ladder "
                  "targets the reference grid"},
    "fused4x4": {"target_max_n": 12, "target_exec_max_n": 22, "reason":
                 "dispatch-bound (~600 4x4 blocks); exec ladder targets "
                 "the reference grid"},
    "scan": {"target_max_n": 16, "target_exec_max_n": 18, "reason":
             "documented negative result (dynamic per-amplitude gathers, "
             "~100x slower): 0.64 s/run at n=14 scales ~2^n to minutes/run "
             "by 22; rungs past 18 burn tens of minutes without changing "
             "the conclusion"},
    "megakernel": {"target_max_n": 16, "target_exec_max_n": 18, "reason":
                   "whole-circuit unrolled jit: remote compile time grows "
                   "with n (minutes at 16, and the MLIR payload approaches "
                   "the remote compiler's ~100 MB cap); superseded by "
                   "mxu/prefetch beyond"},
    "vmem": {"target_max_n": 18, "target_exec_max_n": 18, "reason": "state "
             "must fit VMEM: hard cap n<=19 minus double-buffering margin "
             "(engine/vmem.py)"},
    "mxu": {"target_max_n": 24, "target_exec_max_n": 24, "reason":
            "per-segment temporaries cap the wide engine at n=28; full "
            "rows past 24 cost ~minutes of D2H each over the dev tunnel — "
            "see prefetch for the large-n ladder"},
    "prefetch": {"target_max_n": 26, "target_exec_max_n": 26, "reason":
                 "ladder target n=26; capability extends to n=29 flat "
                 "(n29_demo.json) and n=30 via the in-place halves engine "
                 "(n30_demo.json)"},
    "pallas": {"target_max_n": 14, "target_exec_max_n": 14, "reason":
               "hand-written Karatsuba kernels kept as an ablation; mxu "
               "supersedes it at every n; ladder target n=14 where the "
               "curves are already separated"},
    "sharded": {"target_max_n": None, "reason": "one physical chip in this "
                "environment; virtual-mesh correctness in "
                "tests/test_sharded_prefetch.py, n=31 plan smoke included; "
                "big-n virtual-mesh runs in sharded_bign_cpu.json (8 "
                "virtual CPU devices, not chip timings)"},
}


def derive_ceilings():
    """(Re)generate sweep_ceilings.json FROM the recorded JSONL.

    recorded_max_n / recorded_exec_max_n are the largest n with at least
    one timed row per column (null when the column has no rows at all);
    recorded_runs_at_max counts rows at that ceiling.  target_* carry the
    ladder intent from TARGETS.  The file is derived, never hand-written,
    so it cannot drift from the data again.
    """
    rec = {}
    if os.path.exists(JSONL):
        for line in open(JSONL):
            r = json.loads(line)
            if "seconds" not in r:
                continue  # error/ceiling marker rows carry no timing
            s, mode = r["strategy"], r.get("timing", "full")
            n = r["num_qubits"]
            rec.setdefault(s, {}).setdefault(mode, {}).setdefault(n, 0)
            rec[s][mode][n] += 1
    out = {}
    for s in list(TARGETS) + sorted(set(rec) - set(TARGETS)):
        entry = dict(TARGETS.get(s, {}))
        for mode, key in (("full", "recorded_max_n"),
                          ("exec", "recorded_exec_max_n")):
            by_n = rec.get(s, {}).get(mode)
            if by_n:
                top = max(by_n)
                entry[key] = top
                entry[key.replace("_max_n", "_runs_at_max")] = by_n[top]
            else:
                entry[key] = None
        out[s] = entry
    path = os.path.join(ART, "sweep_ceilings.json")
    with open(path, "w") as f:
        json.dump({"_generated_by": "scripts/sweep_fill.py derive_ceilings "
                   "(from sweep_v5e.jsonl; recorded_* = evidence, "
                   "target_* = ladder intent)", **out}, f, indent=1)
    print(f"derived {path} from {JSONL}", flush=True)
    return out

STAGES = {
    "stage1": [
        ("reference", 15, 18),
        ("naive", 9, 10),
        ("fused2x2", 11, 12),
        ("fused3in1", 9, 10),
        ("fused4x4", 11, 12),
        ("scan", 15, 16),
        ("megakernel", 15, 16),
        ("pallas", 5, 14),
    ],
    "stage2": [
        ("mxu", 21, 24),
        # 18-24 re-measured: the perm-shuffle kernels (round 3) obsolete the
        # earlier rows; the CSV consolidation keeps the freshest per (s, n)
        ("prefetch", 18, 26),
    ],
    "stage3": [
        ("vmem", 16, 18),
    ],
    # n=26 alone in a fresh process: sweep2's single-process 18..25 ladder
    # fragments the heap and 26 then hits RESOURCE_EXHAUSTED
    "stage26": [
        ("prefetch", 26, 26),
    ],
    # refresh the headline full rows under the round-4 auto-precision
    # default (VERDICT r3 #2: re-run the n=24 row with the code as
    # committed)
    "stage24": [
        ("mxu", 24, 24),
        ("prefetch", 24, 24),
    ],
    # exec-only column (VERDICT r3 #5): the dispatch-bound ablations reach
    # the reference's full n=5..22 grid once the tunnel D2H is out of the
    # timed region.  One ladder per stage so a deadline kill loses one
    # ladder, not all (round-4 verdict, Next #2).
    "exec1": [("naive", 16, 22)],          # n<=15 recorded in round 4
    "exec1b": [("fused2x2", 5, 22)],
    "exec1c": [("fused3in1", 5, 22)],
    "exec1d": [("fused4x4", 5, 22)],
    "exec2a": [("scan", 5, 18)],
    "exec2b": [("megakernel", 5, 18)],
    "exec2c": [("vmem", 16, 18), ("pallas", 5, 14)],
    # round-5 queue triage: naive's first exec stage spent its budget on
    # fresh per-rung compiles and was killed at n=16 (queue8.log exec1
    # rc=124), so the verdict-critical naive remainder runs ahead of the
    # mxu ladder in the next slot the queue reaches
    "exec3a": [("naive", 17, 22), ("mxu", 5, 24)],
    "exec3b": [("prefetch", 5, 26)],
    # the full-pipeline pallas ladder from the original stage1 never
    # produced rows (no pallas entries in the JSONL) — retriable alone
    "pallas_full": [("pallas", 5, 14)],
    # full-row gaps vs target ceilings (stage1 was deadline-killed at
    # fused2x2 n=11, queue7.log; everything after it never ran)
    "fullfix": [
        ("fused2x2", 12, 12),
        ("fused3in1", 9, 10),
        ("fused4x4", 11, 12),
        ("scan", 15, 16),
        ("megakernel", 15, 16),
        ("vmem", 18, 18),
    ],
}

EXEC_STAGES = {s for s in STAGES if s.startswith("exec")}


ORDER = ["reference", "naive", "fused2x2", "fused3in1", "fused4x4", "scan",
         "megakernel", "pallas", "vmem", "mxu", "prefetch"]


def consolidate():
    """Rewrite the CSV so each strategy appears once, keeping the FRESHEST
    rows per (strategy, n) — re-measured ladders (e.g. prefetch after the
    round-3 perm-shuffle kernels) supersede earlier sections.  A newer
    group only supersedes when it has at least as many timed rows, so a
    deadline-truncated partial rerun (2 of 5 runs) never replaces an
    earlier complete 5-run group (round-4 ADVICE #3).  The JSONL is the
    append-only full history."""
    import re
    groups = []  # (section, n, [seconds lines]) in file order
    cur = n = None
    for line in open(CSV):
        line = line.strip()
        m = re.match(r"^([a-z0-9_]+(?: \(exec\))?):$", line)
        if m:
            cur, n = m.group(1), None
            continue
        m = re.match(r"^Num QBit (\d+):$", line)
        if m:
            n = int(m.group(1))
            groups.append((cur, n, []))
            continue
        if line:
            groups[-1][2].append(line)
    latest = {}  # (section, n) -> [seconds lines]
    for section, n, rows in groups:
        key = (section, n)
        if rows and len(rows) >= len(latest.get(key, ())):
            latest[key] = rows

    def order_key(section):
        base = section.replace(" (exec)", "")
        rank = ORDER.index(base) if base in ORDER else len(ORDER)
        return (section.endswith("(exec)"), rank, base)  # full cols first

    with open(CSV, "w") as f:
        for s in sorted({k[0] for k in latest}, key=order_key):
            ns = sorted(n for (s2, n) in latest if s2 == s)
            f.write(f"{s}:\n")
            for n in ns:
                f.write(f"Num QBit {n}:\n")
                for v in latest[(s, n)]:
                    f.write(v + "\n")
    print(f"consolidated {CSV}: "
          f"{len({k[0] for k in latest})} sections", flush=True)


def missing_exec_ranges(strategies=("naive", "fused2x2", "fused3in1",
                                    "fused4x4")):
    """Contiguous exec-column gaps vs each strategy's target grid,
    derived from the recorded JSONL — deadline-killed ladders leave
    arbitrary prefixes, so the resume point is computed, not hardcoded."""
    have = {}
    if os.path.exists(JSONL):
        for line in open(JSONL):
            r = json.loads(line)
            if r.get("timing") == "exec" and "seconds" in r:
                have.setdefault(r["strategy"], set()).add(r["num_qubits"])
    out = []
    for s in strategies:
        top = TARGETS[s].get("target_exec_max_n")
        if not top:
            continue
        ns = [n for n in range(5, top + 1) if n not in have.get(s, ())]
        while ns:  # split into contiguous ranges
            lo = hi = ns.pop(0)
            while ns and ns[0] == hi + 1:
                hi = ns.pop(0)
            out.append((s, lo, hi))
    return out


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "stage1"
    if stage == "consolidate":
        consolidate()
        derive_ceilings()
        return
    if stage == "ceilings":
        derive_ceilings()
        return
    if stage in ("execfix", "exec3a"):
        # self-healing resume of the dispatch-bound exec ladders (their
        # fixed stages were budget-killed at arbitrary rungs), then the
        # mxu ladder with whatever budget remains
        todo = missing_exec_ranges() + ([("mxu", 5, 24)]
                                        if stage == "exec3a" else [])
        for strategy, lo, hi in todo:
            try:
                run_sweep([strategy], lo, hi, runs=5,
                          csv_path=CSV, jsonl_path=JSONL, timing=["exec"])
            except Exception as e:
                print(f"FAILED {strategy} [{lo},{hi}]: {e!r}",
                      file=sys.stderr, flush=True)
        derive_ceilings()
        print(f"DONE sweep_fill {stage}", flush=True)
        return
    timing = ["exec"] if stage in EXEC_STAGES else ["full"]
    for strategy, lo, hi in STAGES[stage]:
        try:
            run_sweep([strategy], lo, hi, runs=5,
                      csv_path=CSV, jsonl_path=JSONL, timing=timing)
        except Exception as e:  # capture per-strategy failures, keep going
            print(f"FAILED {strategy} [{lo},{hi}]: {e!r}", file=sys.stderr,
                  flush=True)
    derive_ceilings()
    print(f"DONE sweep_fill {stage}", flush=True)


if __name__ == "__main__":
    main()
