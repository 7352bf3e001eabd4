"""Headline benchmark: batched iLEQG solve throughput at horizon T=100.

Target (BASELINE.md): ≥1000 full iLEQG solves/s on one TPU chip at T=100.
The measured unit is the complete reference `solve!` semantics — rollout,
vmapped AD re-approximation, risk-sensitive Riccati DP with μ-restarts and
backtracking line search to convergence — on the nonlinear unicycle model
(n=3, m=2), batched as a vmapped solver bank.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import ILEQGConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.solvers.ileqg import make_batched_solver

BASELINE_SOLVES_PER_S = 1000.0


def main():
    dtype = jnp.float32
    T = 100
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    problem = unicycle(N=T, dtype=dtype)
    # Reference-default iteration budget (ileqg.jl:192).
    config = ILEQGConfig(iter_max=100, d_tol=1e-2)

    bank = make_batched_solver(problem, config)
    x0 = jnp.zeros(3, dtype)
    u_init = jnp.zeros((T, 2), dtype)
    # Spread of risk sensitivities incl. θ=0 — the RAT iLQR workload mix.
    thetas = jnp.linspace(0.0, 0.02, batch).astype(dtype)

    # Warmup / compile.
    res = bank(x0, u_init, thetas)
    res.value.block_until_ready()
    n_failed = int(jnp.sum(res.failed))
    assert n_failed == 0, f"{n_failed}/{batch} lanes failed"

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = bank(x0, u_init, thetas + 1e-5)
        res.value.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    solves_per_s = batch / best
    print(json.dumps({
        "metric": "ileqg_solves_per_s_chip_T100",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
