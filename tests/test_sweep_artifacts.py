"""Sweep artifact generation: the committed ceilings file is DERIVED from
the recorded JSONL (round-4 verdict, "What's weak" #1 — an artifact that
states more than was measured is worse than a missing one), and CSV
consolidation never lets a truncated partial rerun supersede a complete
group (round-4 ADVICE #3)."""

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sweep_fill():
    spec = importlib.util.spec_from_file_location(
        "sweep_fill", os.path.join(HERE, "scripts", "sweep_fill.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_derive_ceilings_reports_only_recorded(tmp_path, monkeypatch):
    sf = _load_sweep_fill()
    jsonl = tmp_path / "sweep.jsonl"
    rows = [
        {"strategy": "naive", "timing": "full", "num_qubits": 9,
         "num_gates": 10, "num_fused_ops": 10, "run": 0, "seconds": 0.5},
        {"strategy": "naive", "timing": "full", "num_qubits": 10,
         "num_gates": 10, "num_fused_ops": 10, "run": 0, "seconds": 0.6},
        {"strategy": "naive", "timing": "exec", "num_qubits": 15,
         "num_gates": 10, "num_fused_ops": 10, "run": 0, "seconds": 0.1},
        {"strategy": "naive", "timing": "exec", "num_qubits": 15,
         "num_gates": 10, "num_fused_ops": 10, "run": 1, "seconds": 0.1},
        # error marker rows carry no seconds and must not count as coverage
        {"strategy": "naive", "timing": "exec", "num_qubits": 22,
         "error": "RESOURCE_EXHAUSTED"},
    ]
    jsonl.write_text("".join(json.dumps(r) + "\n" for r in rows))
    monkeypatch.setattr(sf, "JSONL", str(jsonl))
    monkeypatch.setattr(sf, "ART", str(tmp_path))
    out = sf.derive_ceilings()
    assert out["naive"]["recorded_max_n"] == 10
    assert out["naive"]["recorded_exec_max_n"] == 15
    assert out["naive"]["recorded_exec_runs_at_max"] == 2
    # intent targets survive alongside evidence, clearly labeled
    assert out["naive"]["target_exec_max_n"] == 22
    # strategies with no rows report null evidence, never the target
    assert out["fused3in1"]["recorded_exec_max_n"] is None
    disk = json.load(open(tmp_path / "sweep_ceilings.json"))
    assert "recorded_* = evidence" in disk["_generated_by"]


def test_consolidate_keeps_complete_group_over_partial(tmp_path, monkeypatch):
    sf = _load_sweep_fill()
    csv = tmp_path / "t.csv"
    csv.write_text(
        "mxu:\n"
        "Num QBit 5:\n" + "".join(f"0.10000{i}\n" for i in range(5)) +
        "Num QBit 6:\n"  # deadline-killed: header, no rows
        "mxu:\n"
        "Num QBit 5:\n0.090000\n0.090001\n"  # partial rerun: 2 of 5 runs
    )
    monkeypatch.setattr(sf, "CSV", str(csv))
    sf.consolidate()
    text = csv.read_text()
    assert text.count("mxu:") == 1
    assert text.count("Num QBit 5:") == 1
    assert "Num QBit 6:" not in text      # empty group dropped
    assert text.count("0.10000") == 5     # complete group retained
    assert "0.090000" not in text         # partial rerun did not supersede


def test_consolidate_fresher_complete_group_supersedes(tmp_path, monkeypatch):
    sf = _load_sweep_fill()
    csv = tmp_path / "t.csv"
    csv.write_text(
        "mxu:\nNum QBit 5:\n" + "".join(f"0.2\n" for _ in range(5)) +
        "mxu:\nNum QBit 5:\n" + "".join(f"0.1\n" for _ in range(5))
    )
    monkeypatch.setattr(sf, "CSV", str(csv))
    sf.consolidate()
    text = csv.read_text()
    assert "0.2" not in text and text.count("0.1\n") == 5
