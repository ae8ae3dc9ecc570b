import json
import subprocess
import sys

import pytest


def _run_cli(*args):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os

    full_env = dict(os.environ)
    full_env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from gpu_quantum_simulator_tpu.__main__ import main; import sys;"
         f"sys.exit(main({list(args)!r}))"],
        capture_output=True,
        text=True,
        env=full_env,
        cwd="/root/repo",
    )


def test_cli_seconds_output():
    r = _run_cli("/root/reference/entanglement.qasm", "--strategy", "megakernel")
    assert r.returncode == 0, r.stderr
    float(r.stdout.strip().splitlines()[0])  # one float, like the reference


def test_cli_json_and_measurements():
    r = _run_cli(
        "/root/reference/entanglement.qasm",
        "--strategy", "megakernel", "--json", "-m", "20", "--seed", "3",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["num_qubits"] == 2 and rec["num_gates"] == 2
    meas = [l for l in lines if l.startswith("MEASUREMENT:")]
    assert len(meas) == 20
    # Bell: only 00 and 11
    for m in meas:
        assert m.split()[1] in ("00", "11")


def test_cli_amplitudes():
    r = _run_cli(
        "/root/reference/entanglement.qasm", "--strategy", "megakernel",
        "--amplitudes", "2",
    )
    assert r.returncode == 0, r.stderr
    assert "|00>" in r.stdout and "|11>" in r.stdout


def test_cli_parse_error():
    r = _run_cli("/no/such/file.qasm")
    assert r.returncode == 1
    assert "ERROR while parsing quantum circuit" in r.stderr


def test_cli_expectation(tmp_path, capsys):
    import numpy as np

    from gpu_quantum_simulator_tpu.__main__ import main
    from gpu_quantum_simulator_tpu import models

    f = tmp_path / "ghz.qasm"
    f.write_text(models.ghz(3).to_qasm())
    rc = main([str(f), "--strategy", "reference",
               "--expectation", "Z0 Z1", "--expectation", "XXX"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("EXPECTATION")]
    assert len(lines) == 2
    # GHZ: <Z0 Z1> = +1, <XXX> = +1
    assert abs(float(lines[0].split(":")[1]) - 1.0) < 1e-6
    assert abs(float(lines[1].split(":")[1]) - 1.0) < 1e-6


def test_cli_expectation_bad_string(tmp_path, capsys):
    from gpu_quantum_simulator_tpu.__main__ import main
    from gpu_quantum_simulator_tpu import models

    f = tmp_path / "c.qasm"
    f.write_text(models.ghz(2).to_qasm())
    rc = main([str(f), "--strategy", "reference", "--expectation", "QQ"])
    assert rc == 1


def test_cli_precision_flag():
    # the speed/accuracy ladder knob: high must run and stay parity-close
    # on a tiny circuit (on CPU f32 the precision enums are all exact)
    r = _run_cli("/root/reference/entanglement.qasm", "--strategy",
                 "megakernel", "--precision", "high", "--amplitudes", "2")
    assert r.returncode == 0, r.stderr
    assert "|00>" in r.stdout and "|11>" in r.stdout


def test_cli_noisy_sampling():
    r = _run_cli("/root/reference/entanglement.qasm", "-m", "50",
                 "--noise-p1", "0.2", "--noise-p2", "0.2", "--seed", "4")
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("MEASUREMENT")]
    assert len(lines) == 50
    # depolarizing at p=0.2 must break perfect Bell correlation sometimes
    outcomes = {int(l.split("(")[1].rstrip(")")) for l in lines}
    assert outcomes - {0, 3}, outcomes


def test_cli_noise_requires_measurements():
    r = _run_cli("/root/reference/entanglement.qasm", "--noise-p1", "0.1")
    assert r.returncode == 1
    assert "requires -m" in r.stderr


def test_cli_noise_rejects_amplitudes():
    r = _run_cli("/root/reference/entanglement.qasm", "-m", "5",
                 "--noise-p1", "0.1", "--amplitudes", "2")
    assert r.returncode == 1
    assert "--amplitudes" in r.stderr


def test_cli_trace(tmp_path):
    d = str(tmp_path / "trace")
    r = _run_cli("/root/reference/entanglement.qasm", "--trace", d)
    assert r.returncode == 0, r.stderr
    import os

    assert os.path.isdir(d) and any(os.scandir(d))


def test_cli_marginal_and_entropy():
    """--marginal / --entropy-cut on the Bell circuit: the 1-qubit marginal
    is 50/50, the 2-qubit joint has no odd-parity mass, and the cut-1
    entropy is exactly 1 bit."""
    r = _run_cli("/root/reference/entanglement.qasm", "--strategy", "mxu",
                 "--marginal", "0", "--marginal", "0,1",
                 "--entropy-cut", "1")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    m0 = {l.split(">:")[0][-1]: float(l.split(":")[-1])
          for l in lines if l.startswith("MARGINAL 0 ")}
    assert abs(m0["0"] - 0.5) < 1e-5 and abs(m0["1"] - 0.5) < 1e-5
    joint = {l.split("|")[1].split(">")[0]: float(l.split(":")[-1])
             for l in lines if l.startswith("MARGINAL 0,1 ")}
    assert abs(joint["00"] - 0.5) < 1e-5 and abs(joint["11"] - 0.5) < 1e-5
    assert joint["01"] < 1e-6 and joint["10"] < 1e-6
    ent = [l for l in lines if l.startswith("ENTROPY")]
    assert len(ent) == 1 and abs(float(ent[0].split(":")[1].split()[0]) - 1.0) < 1e-5

    # error paths
    r = _run_cli("/root/reference/entanglement.qasm", "--marginal", "7")
    assert r.returncode == 1 and "out of range" in r.stderr
    r = _run_cli("/root/reference/entanglement.qasm", "--entropy-cut", "2")
    assert r.returncode == 1


def test_cli_split_state_inplace(tmp_path):
    """--inplace drives the n>=30-style split-state path end-to-end: the
    flat state is never built; amplitudes/marginal/entropy/sampling all
    come from halves reductions.  GHZ(10): tops {0, 2^10-1}, 50/50
    marginal over [0,1] on 00/11, 1 bit of entropy at any cut."""
    from gpu_quantum_simulator_tpu import models

    n = 10
    f = tmp_path / "ghz.qasm"
    f.write_text(models.ghz(n).to_qasm())
    r = _run_cli(
        str(f), "--strategy", "prefetch",
        "--inplace", "--json", "--amplitudes", "2", "-m", "10",
        "--marginal", "0,1", "--entropy-cut", "2", "--seed", "1",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["split_state"] is True and abs(rec["norm"] - 1.0) < 1e-4
    amp_lines = [l for l in lines if l.startswith("|")]
    tops = {int(l.split(">")[0][1:], 2) for l in amp_lines}
    assert tops == {0, (1 << n) - 1}
    meas = [l for l in lines if l.startswith("MEASUREMENT:")]
    assert len(meas) == 10
    assert {m.split()[1] for m in meas} <= {"0" * n, "1" * n}
    marg = {l.split()[2]: float(l.split()[-1])
            for l in lines if l.startswith("MARGINAL")}
    assert abs(marg["|00>:"] - 0.5) < 1e-4 and abs(marg["|11>:"] - 0.5) < 1e-4
    ent = [l for l in lines if l.startswith("ENTROPY cut=2")]
    assert ent and abs(float(ent[0].split()[-2]) - 1.0) < 1e-4
    # split checkpoint round-trip: save GHZ, resume with X-layer -> back
    # to a product state whose top amplitude is |1...1> with p ~ 0.5 twice
    ck = tmp_path / "ghz_halves.npz"
    r2 = _run_cli(str(f), "--strategy", "prefetch", "--inplace",
                  "--save-state", str(ck))
    assert r2.returncode == 0, r2.stderr
    g = tmp_path / "xlayer.qasm"
    xl = models.ghz(n)
    xl.gates.clear()
    for q in range(n):
        xl.x(q)
    g.write_text(xl.to_qasm())
    r3 = _run_cli(str(g), "--strategy", "prefetch", "--inplace",
                  "--load-state", str(ck), "--amplitudes", "2")
    assert r3.returncode == 0, r3.stderr
    tops3 = {l.split(">")[0][1:]: float(l.split("p=")[1].split()[0])
             for l in r3.stdout.splitlines() if l.startswith("|")}
    # X^n maps GHZ onto itself: both branches still carry p ~ 0.5 (a
    # reset-to-|0> resume would put ALL mass on |1...1>)
    assert abs(tops3["0" * n] - 0.5) < 1e-4
    assert abs(tops3["1" * n] - 0.5) < 1e-4
    # too-small widths are rejected cleanly
    r4 = _run_cli("/root/reference/entanglement.qasm", "--strategy",
                  "prefetch", "--inplace")
    assert r4.returncode == 1 and "n >=" in r4.stderr


def test_cli_device_cpu_flag():
    # The flag itself must force the CPU backend BEFORE backend init — no
    # jax.config shim in the subprocess, unlike _run_cli.  With the
    # accelerator tunnel unreachable this is the only way to drive the CLI.
    import os

    env = dict(os.environ)
    env["QSIM_NO_COMPILE_CACHE"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "gpu_quantum_simulator_tpu",
         "/root/reference/entanglement.qasm", "--strategy", "megakernel",
         "--device", "cpu", "--json"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[0])
    assert rec["num_qubits"] == 2
