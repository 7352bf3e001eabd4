"""End-to-end solve parity on the REAL TPU chip — recorded artifact.

BASELINE.md pins semantics parity in float64 via the exception-based
oracle (``tests/oracle.py``, MSE < 1e-10 on CPU).  This script records the
*accuracy* statement for the production path: the f32 TPU solver bank
(Pallas Riccati kernel engaged) against the same oracle run in float64,
as control-sequence MSE and value deviation per (model, θ) case —
``benchmarks/solve_tpu_parity.json``.

The oracle runs in a CPU-forced subprocess: the axon sitecustomize routes
eager ops in this process through the TPU tunnel (~27 ms each), which
would make the eager oracle unusably slow here, and the oracle needs f64
anyway.

Usage: python benchmarks/verify_solve_tpu.py [--json out.json]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = [
    # (model ctor name, N, thetas)
    ("unicycle", 50, [0.0, 0.005, 0.01]),
    ("nonlinear_toy", 10, [0.0, 0.01]),
]

_ORACLE_SCRIPT = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from ratilqr_tpu import models
from tests.oracle import oracle_solve

out = {{}}
for name, N, thetas in {cases!r}:
    prob = getattr(models, name)(N=N)
    n = 3 if name == "unicycle" else 2
    x0 = np.zeros(n); u0 = np.zeros((N, 2))
    for th in thetas:
        x, l, L, value, _ = oracle_solve(prob, x0, [u for u in u0], th)
        out[f"{{name}}_N{{N}}_th{{th}}"] = {{
            "l": np.asarray(l).tolist(), "value": float(value)}}
with open({out_path!r}, "w") as f:
    json.dump(out, f)
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--json",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "solve_tpu_parity.json"))
    args = parser.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        oracle_path = tf.name
    script = _ORACLE_SCRIPT.format(repo=repo, cases=CASES,
                                   out_path=oracle_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, "-c", script], check=True, env=env,
                   timeout=1800)
    with open(oracle_path) as f:
        oracle = json.load(f)
    os.unlink(oracle_path)

    import jax
    import jax.numpy as jnp

    from ratilqr_tpu import ILEQGConfig, models
    from ratilqr_tpu.solvers.ileqg import make_batched_solver

    tpu = jax.devices()[0]
    assert tpu.platform != "cpu", "run on the real chip"
    results = {"device": str(tpu), "dtype": "float32",
               "oracle": "tests/oracle.py float64 (CPU subprocess)"}
    dtype = jnp.float32
    worst_mse = 0.0
    for name, N, thetas in CASES:
        prob = getattr(models, name)(N=N, dtype=dtype)
        n = 3 if name == "unicycle" else 2
        x0 = jnp.zeros(n, dtype)
        u0 = jnp.zeros((N, 2), dtype)
        # Pad the bank to engage the production Pallas dispatch path.
        pad = 256
        th_bank = jnp.asarray(
            np.resize(np.asarray(thetas, np.float32), pad))
        bank = make_batched_solver(prob, ILEQGConfig(scan_unroll=10))
        res = bank(x0, u0, th_bank)
        l_bank = np.asarray(jax.device_get(res.l), np.float64)
        v_bank = np.asarray(jax.device_get(res.value), np.float64)
        for i, th in enumerate(thetas):
            key = f"{name}_N{N}_th{th}"
            l_ref = np.asarray(oracle[key]["l"])
            v_ref = oracle[key]["value"]
            mse = float(np.mean((l_bank[i] - l_ref) ** 2))
            worst_mse = max(worst_mse, mse)
            results[key] = {
                "control_mse_f32tpu_vs_f64oracle": mse,
                "value_rel_dev": float(abs(v_bank[i] - v_ref)
                                       / (abs(v_ref) + 1e-9)),
            }
    results["worst_control_mse"] = worst_mse
    results["baseline_target"] = "MSE < 1e-4 (BASELINE.md)"
    results["meets_target"] = bool(worst_mse < 1e-4)

    with open(args.json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
