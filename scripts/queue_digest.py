"""Digest the serialized TPU work queue's outputs into one decision table.

After scripts/tpu_queue.sh drains (or partially drains before its
deadline), this prints per-stage status from queue_logs/queue.log, the key
numbers from each artifact the stages write, and the concrete decisions
they feed:

  * stream vs grid kernel form (micro24 vs micro24s, bench vs bench_stream,
    micro24ip vs micro24ips)  ->  QSIM_STREAM_PLAIN default
  * refreshed per-step costs  ->  scripts/plan_model.py calibration
  * n29/n30 demo seconds      ->  headline large-n story
  * sweep2/sweep3 fill status ->  OverallTest_v5e.csv completeness

Usage: python scripts/queue_digest.py
"""

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "bench_artifacts")
LOGS = os.path.join(ART, "queue_logs")


def _load(name):
    path = os.path.join(ART, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def stage_status():
    path = os.path.join(LOGS, "queue.log")
    if not os.path.exists(path):
        print("no queue.log yet (queue has not started)")
        return {}
    status = {}
    for line in open(path):
        m = re.search(r"END (\S+) rc=(\d+)", line)
        if m:
            status[m.group(1)] = int(m.group(2))
        m = re.search(r"SKIP (\S+)", line)
        if m:
            status[m.group(1)] = "skipped(deadline)"
        m = re.search(r"START (\S+)", line)
        if m and m.group(1) not in status:
            status[m.group(1)] = "running"
    print("stage status:", json.dumps(status))
    return status


def _fmt_micro(tag):
    """Marginal us per grid step per op for each measured step kind.

    Each *_ms entry is ONE pass (already divided by the repetition count C);
    a pass covers 2^n/(2*128*T) grid steps; names ending in an op-count
    (mat4, perm4, tswap4, mat12) hold that many ops per grid step."""
    d = _load(tag + ".json")
    if d is None:
        return None
    T = d.get("T", 512)
    grid = (1 << d["n"]) // (2 * 128 * T)
    counts = {"mat1": 1, "mat4": 4, "mat12": 12, "perm1": 1, "perm4": 4,
              "mono1": 1, "mono4": 4, "tswap4": 4, "mat128_1": 1}
    out = {"empty_us_per_gs": round(d["empty_pass_ms"] / grid * 1e3, 2),
           "hbm_bound_us_per_gs": round(d["hbm_roundtrip_bound_ms"] / grid * 1e3, 2)}
    for key in sorted(d):
        if not key.endswith("_ms") or key in ("empty_pass_ms", "hbm_roundtrip_bound_ms"):
            continue
        stem = key[:-3]
        per_op = (d[key] - d["empty_pass_ms"]) / grid / counts.get(stem, 1) * 1e3
        out[stem + "_us"] = round(per_op, 2)
    return out


def main():
    status = stage_status()

    for line_name, log in (("verify", "verify.log"), ("bench", "bench.log"),
                           ("bench_stream", "bench_stream.log"),
                           ("bench_vmem", "bench_vmem.log"),
                           ("bench_mxu", "bench_mxu.log")):
        path = os.path.join(LOGS, log)
        if os.path.exists(path):
            tail = [l.strip() for l in open(path).read().splitlines()[-4:]]
            print(f"{line_name}: {tail}")

    dma = _load("dma_probe_n24.json")
    if dma:
        rates = {k: round(v, 1) for k, v in sorted(dma.items())
                 if isinstance(v, (int, float)) and "gbs" in k.lower()}
        if not rates:
            rates = {k: v for k, v in dma.items() if k != "n"}
        print("dma_probe:", json.dumps(rates))

    pairs = [("kernel_micro_n24", "kernel_micro_n24_stream"),
             ("kernel_micro_n24_inplace", "kernel_micro_n24_inplace_stream")]
    for grid_tag, stream_tag in pairs:
        g, s = _fmt_micro(grid_tag), _fmt_micro(stream_tag)
        if g:
            print(f"{grid_tag}:", json.dumps(g))
        if s:
            print(f"{stream_tag}:", json.dumps(s))
        if g and s:
            common = [k for k in g if k in s and k.endswith("_us")]
            wins = {k: round(s[k] / g[k], 2) for k in common if g[k]}
            better = sum(1 for v in wins.values() if v < 0.95)
            print(f"  stream/grid ratios: {json.dumps(wins)}")
            print(f"  -> streaming {'WINS' if better >= len(wins) / 2 else 'does not win'}"
                  f" on {better}/{len(wins)} step kinds"
                  " (flip QSIM_STREAM_PLAIN default if it wins broadly)")

    for demo in ("n29_demo", "n30_demo", "fusion_ab", "density_demo", "kh0_ab",
                 "variational_demo", "noisy_demo", "knob_ab", "vqe_demo",
                 "quench_demo", "stream_relayout_ab", "precision_ab",
                 "grover22_demo", "clifford30_check", "qv_demo", "diag24",
                 "inplace_knob_ab"):
        d = _load(demo + ".json")
        if d:
            brief = {}
            for k, v in d.items():
                if isinstance(v, (int, float, str)):
                    brief[k] = v
                elif isinstance(v, dict):
                    for kk in ("seconds", "exec_s", "warm_s"):
                        if kk in v:
                            brief[k] = v[kk]
                            break
            print(f"{demo}:", json.dumps(brief))

    # sweep fill: rows per (strategy) with max n, from the JSONL
    path = os.path.join(ART, "sweep_v5e.jsonl")
    if os.path.exists(path):
        ceil = {}
        for line in open(path):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            s, n = r.get("strategy"), r.get("n") or r.get("num_qubits")
            if s and n:
                ceil[s] = max(ceil.get(s, 0), n)
        print("sweep ladder ceilings:", json.dumps(dict(sorted(ceil.items()))))

    if status:
        undone = [k for k, v in status.items() if v != 0]
        print("ACTION: rerun/inspect stages:", undone if undone else "none — queue clean")


if __name__ == "__main__":
    main()
