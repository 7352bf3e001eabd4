"""Headline benchmark: batched iLEQG solve throughput at horizon T=100.

Target (BASELINE.md): ≥1000 full iLEQG solves/s on one TPU chip at T=100.
The measured unit is the complete reference `solve!` semantics — rollout,
vmapped AD re-approximation, risk-sensitive Riccati DP with μ-restarts and
backtracking line search to convergence — on the nonlinear unicycle model
(n=3, m=2), batched as a vmapped solver bank.

Workload regime: steady-state MPC re-planning — the bank is warm-started
from a previous solution at a perturbed state, exactly the per-cycle work a
RAT iLQR MPC controller performs (SURVEY.md §3.5).  A cold-start solve
(solver iterates to convergence from a zero schedule) is excluded from
timing as compile/warmup; cold-regime numbers are recorded separately in
`benchmarks/results_tpu.json` (the reference-default cold bank and the
tuned `adaptive_eps_init`/`ls_chunk` cold bank — see BASELINE.md).

The headline is a SINGLE-dispatch latency measurement (one bank call,
value fetched to the host each rep) — no dispatch pipelining.  Set
BENCH_PIPELINE_DEPTH>1 to also print the pipelined-throughput regime a
serving deployment would run (kept out of the headline per the round-1
review).  Solver config: reference iteration budget (`ileqg.jl:192`,
iter_max=100, d=1e-2) with the reference's adaptive-ε line-search
warm-start enabled (`adaptive_ϵ_init`, `ileqg.jl:193,582-591`) — a
reference-provided feature, same convergence criterion.

Timing fetches output values to the host each rep: `block_until_ready` is
a no-op on the tunneled axon backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import ILEQGConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.solvers.ileqg import make_batched_solver

BASELINE_SOLVES_PER_S = 1000.0


def fetch(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def main(attempts: int = 3):
    """Measure and print the headline JSON line.

    The tunneled TPU service is shared; a transient dispatch failure on one
    attempt would otherwise lose the whole round's headline, so the
    measurement retries up to ``attempts`` times (the final attempt
    propagates, so real breakage still fails loudly).
    """
    for attempt in range(1, attempts + 1):
        try:
            _run()
            return
        except Exception as e:  # noqa: BLE001 — transient tunnel errors
            if attempt == attempts:
                raise
            print(f"bench attempt {attempt}/{attempts} failed "
                  f"({type(e).__name__}: {e}); retrying",
                  file=sys.stderr)
            time.sleep(5.0)


def _run():
    dtype = jnp.float32
    T = 100
    # One ~27 ms tunnel round trip per dispatch dominates small banks
    # (marginal device cost is ~1.2 µs/solve warm).  The knee of the
    # B-scaling curve MOVED after the round-5 fused kernels: the old
    # B≥131k regression (linear-in-B while-carry select sweeps over the
    # rollout/approximation stacks — 464k at 128k lanes, 432k at 256k)
    # died with the stacks themselves, and an interleaved same-process
    # sweep now reads 743k / 742k / 795-805k / 727k at 65k / 131k /
    # 262k / 524k lanes — B=262,144 is the new knee.  For a
    # latency-constrained fleet-MPC cycle use B=16,384.
    batch = int(os.environ.get("BENCH_BATCH", "262144"))
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", "1"))
    problem = unicycle(N=T, dtype=dtype)
    # Reference iteration budget (ileqg.jl:192) + adaptive ε warm start
    # (ileqg.jl:193): warm re-plans converge in ~2 iterations.
    # eps_history_cap=0 turns off per-lane trial diagnostics (eps_count is
    # still exact) — nobody reads 2048 lanes of (ε, Δvalue) pairs, and the
    # buffer otherwise dominates the line-search while-carry.
    # fused_candidate_eval: the line-search trial (and the initialize!
    # evaluation) runs as ONE Mosaic program with the rollout/
    # approximation stacks in VMEM (ops/candidate_pallas.py) — measured
    # +30% composed at this bank (626k vs 480k warm solves/s, round-5
    # interleaved A/B; equivalence pinned by tests/test_candidate_fused).
    # fused_step_optimize: the step-side pipeline (rollout + quadratize +
    # optimizing DP) fused the same way (ops/step_pallas.py) — measured
    # +18% composed on top (666k vs 563k, benchmarks/
    # step_tpu_verification.json; equivalence pinned by
    # tests/test_step_fused.py, warm values bit-identical on-device).
    config = ILEQGConfig(iter_max=100, d_tol=1e-2, scan_unroll=10,
                         adaptive_eps_init=True, eps_history_cap=0,
                         fused_candidate_eval=True,
                         fused_step_optimize=True)

    bank = make_batched_solver(problem, config)
    x0 = jnp.zeros(3, dtype)
    u_cold = jnp.zeros((T, 2), dtype)
    # Spread of risk sensitivities incl. θ=0 — the RAT iLQR workload mix.
    thetas = jnp.linspace(0.0, 0.02, batch).astype(dtype)

    # Cold start: compile + produce a warm-start schedule (untimed in the
    # headline, but recorded — the first call's cost depends on whether
    # /root/repo/.jax_cache already holds this executable, so the artifact
    # records both the time and the cache state to keep round-over-round
    # comparisons honest).
    cache_dir = "/root/repo/.jax_cache"
    cache_entries = (len(os.listdir(cache_dir))
                     if os.path.isdir(cache_dir) else 0)
    t0 = time.perf_counter()
    res = bank(x0, u_cold, thetas)
    n_failed = int(fetch(jnp.sum(res.failed)))
    first_call_s = time.perf_counter() - t0
    assert n_failed == 0, f"{n_failed}/{batch} lanes failed"
    u_warm = res.l[0]

    # Steady-state MPC regime: warm-started re-plan at a perturbed state.
    x_mpc = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)
    vals = fetch(bank(x_mpc, u_warm, thetas).value)  # warmup this shape
    assert np.all(np.isfinite(vals))

    reps = 5
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        outs = [bank(x_mpc + 1e-5 * (depth * i + j), u_warm, thetas)
                for j in range(depth)]
        for out in outs:
            _ = fetch(out.value)
        best = min(best, (time.perf_counter() - t0) / depth)

    solves_per_s = batch / best
    record = {
        "metric": "ileqg_solves_per_s_chip_T100",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        # Self-describing workload keys: the metric is only comparable
        # across rounds at equal bank size/pipelining (advisor round 2).
        "batch": batch,
        # First bank call = compile, or persistent-cache reload when
        # .jax_cache already holds the executable (entries>0 → warm cache).
        "first_call_s": round(first_call_s, 2),
        "jax_cache_entries_before": cache_entries,
    }
    if depth > 1:
        record["pipeline_depth"] = depth
    print(json.dumps(record))


if __name__ == "__main__":
    main()
