"""Run-to-run spread for the headline warm-bank throughput cells.

VERDICT r3 item 5: the claim that the B=131k/262k rows sit "within each
other's run-to-run spread" rested on one sample per cell, and the headline
B=65,536 number had no recorded spread at all.  This script measures each
bank-size cell ``n_reps`` times (each rep is itself a best-of-5
single-dispatch latency, the same protocol as ``bench.py``) and writes
``benchmarks/bank_spread.json`` with min/median/max solves/s per cell.
``benchmarks/make_tables.py`` renders the spread next to each headline
number in README.md / BASELINE.md.

Usage (on the TPU):  python benchmarks/bank_spread.py [n_reps]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import ILEQGConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.solvers.ileqg import make_batched_solver

BATCHES = (16384, 65536, 131072, 262144, 524288)
T = 100


def fetch(x):
    return np.asarray(jax.device_get(x))


def measure_cell(bank, x_mpc, u_warm, thetas, batch):
    """One rep: best-of-5 single-dispatch bank latency (bench.py protocol)."""
    best = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        out = bank(x_mpc + 1e-5 * i, u_warm, thetas)
        _ = fetch(out.value)
        best = min(best, time.perf_counter() - t0)
    return batch / best


def main(n_reps=3):
    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    config = ILEQGConfig(iter_max=100, d_tol=1e-2, scan_unroll=10,
                         adaptive_eps_init=True, eps_history_cap=0,
                         fused_candidate_eval=True,
                         fused_step_optimize=True)
    bank = make_batched_solver(problem, config)
    x0 = jnp.zeros(3, dtype)
    x_mpc = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)

    cells = {}
    for batch in BATCHES:
        thetas = jnp.linspace(0.0, 0.02, batch).astype(dtype)
        res = bank(x0, jnp.zeros((T, 2), dtype), thetas)  # cold + compile
        assert int(fetch(jnp.sum(res.failed))) == 0
        u_warm = res.l[0]
        fetch(bank(x_mpc, u_warm, thetas).value)  # warmup
        reps = [measure_cell(bank, x_mpc, u_warm, thetas, batch)
                for _ in range(n_reps)]
        cells[str(batch)] = {
            "solves_per_s_min": round(min(reps), 1),
            "solves_per_s_median": round(statistics.median(reps), 1),
            "solves_per_s_max": round(max(reps), 1),
            "n_reps": n_reps,
        }
        print(batch, cells[str(batch)], flush=True)

    out = {
        "protocol": "each rep = best-of-5 single-dispatch warm bank "
                    "latency (bench.py protocol); unicycle T=100, "
                    "adaptive eps, eps_history_cap=0, scan_unroll=10, fused_candidate_eval",
        "cells": cells,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bank_spread.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
