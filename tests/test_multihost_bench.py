"""CI smoke for ``benchmarks/multihost.py`` (round-4 VERDICT item 5).

The multi-host scaling row in BASELINE.md is "pending hardware" — this
test keeps the measurement *instrument* working so that when a pod slice
appears the benchmark runs unchanged: a single-process baseline run, then
a genuine 2-process ``jax.distributed`` run over one global CPU mesh with
``--baseline`` wiring the scaling-efficiency computation.  Tiny sizes; we
assert the protocol (keys, positivity, efficiency computed), not rates.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multihost.py")

SIZES = ["--pets-samples", "32", "--pets-traj", "2", "--theta-bank", "16",
         "--fleet-episodes", "8", "--horizon", "8", "--ileqg-iters", "2",
         "--reps", "1"]

RATE_KEYS = ("pets_rollouts_per_s", "theta_solves_per_s",
             "fleet_episodes_per_s")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # script sets its own device count
    return env


@pytest.fixture(scope="module")
def baseline_json(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mh") / "baseline.json")
    proc = subprocess.run(
        [sys.executable, "-u", SCRIPT, "--cpu-devices", "2", "--out", out]
        + SIZES, env=_env(), capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(out) as f:
        return out, json.load(f)


def test_single_host_baseline(baseline_json):
    _, rec = baseline_json
    assert rec["process_count"] == 1
    assert rec["global_devices"] == 2
    for k in RATE_KEYS:
        assert rec[k] > 0, (k, rec)
    assert rec["elite_collective_ms"] > 0


def test_two_process_scaling_run(baseline_json):
    base_path, base = baseline_json
    out = base_path.replace("baseline.json", "multi.json")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-u", SCRIPT, "--cpu-devices", "1",
         "--coordinator", f"localhost:{port}", "--num-processes", "2",
         "--process-id", str(pid), "--baseline", base_path, "--out", out]
        + SIZES, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost bench workers timed out\n" + "\n".join(outs))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{o}"
    with open(out) as f:
        rec = json.load(f)
    assert rec["process_count"] == 2
    assert rec["global_devices"] == 2  # 1 virtual CPU device per process
    for k in RATE_KEYS:
        assert rec[k] > 0
        # Efficiency computed (2 procs on one shared VM: value is noise —
        # the assertion is that the protocol produced it).
        assert f"scaling_efficiency_{k}" in rec, rec.keys()
    assert "scaling_note" not in rec  # sizes matched the baseline
