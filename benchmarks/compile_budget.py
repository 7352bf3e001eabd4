"""Cold-start budget per public entry point (round-4 VERDICT item 2).

``BENCH_r04.json`` recorded ``first_call_s: 1523`` — a 25-minute first
dispatch for the headline bank — with 161 persistent-cache entries on
disk, and nothing tracked compile time per entry point.  Diagnosis
(measured, round 5): the 1523 s was a genuine cache MISS (round-4 solver
changes changed the program key) paying a full XLA compile through the
SHARED tunnel compile service at its congested end-of-round tail; the
entry was then written, and subsequent warm-cache first calls of the
identical program measured 318 s → 129 s → 15.7 s in one afternoon —
all HITS (no new cache entries written), the spread being the shared
service's executable-load variance, not recompilation.

This script makes cold start a *measured, managed* quantity: each public
entry point runs in a FRESH subprocess (the deployment situation: a cold
replica with a warm on-disk cache) and records

  - ``first_call_s``  — process start → first result fetched,
  - ``second_call_s`` — steady state, for contrast,
  - ``cache_hit``     — True iff no new persistent-cache entry was
    written (a write proves a compile happened),

into ``benchmarks/compile_budget.json``.  Budget (BASELINE.md "Cold
start"): every entry point's warm-cache first call ≤ 120 s; entries that
exceed it on a quiet tunnel are a bug (key churn), not noise.

Deployment warmup flow (docs/performance.md "Cold start"): ship
``.jax_cache`` with the image (entries are platform-keyed), run the
entry point once at boot before admitting traffic, alert on
``cache_hit == False``.

Usage: ``python benchmarks/compile_budget.py [--entries a,b,...]``
(parent mode; writes the JSON).  ``--entry NAME`` is the internal
child-process mode.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CACHE_DIR = os.path.join(ROOT, ".jax_cache")

ENTRIES = ("headline_bank", "ratilqr_jit", "nm_jit_depth1_refresh",
           "nm_jit_depth3_refresh", "nm_jit_stale", "episode_fleet",
           "pets_16k")


def _build(entry):
    """Build one public entry point at its benchmark fixture; returns a
    zero-arg callable whose first invocation is 'the first plan'."""
    import jax
    import jax.numpy as jnp

    from ratilqr_tpu import (CrossEntropyConfig, ILEQGConfig,
                             NelderMeadConfig, PETSConfig)
    from ratilqr_tpu.models import gmm_integrator, unicycle
    from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit, ratilqr
    from ratilqr_tpu.solvers import pets as pets_mod
    from ratilqr_tpu.solvers import ratilqr_jit
    from ratilqr_tpu.solvers.ileqg import make_batched_solver

    dtype = jnp.float32

    if entry == "headline_bank":
        # bench.py's exact configuration (B=262,144 — the round-5
        # knee bank — T=100, both fused kernels).
        T = 100
        problem = unicycle(N=T, dtype=dtype)
        cfg = ILEQGConfig(iter_max=100, d_tol=1e-2, scan_unroll=10,
                          adaptive_eps_init=True, eps_history_cap=0,
                          fused_candidate_eval=True,
                          fused_step_optimize=True)
        bank = make_batched_solver(problem, cfg)
        x0 = jnp.zeros(3, dtype)
        u0 = jnp.zeros((T, 2), dtype)
        thetas = jnp.linspace(0.0, 0.02, 262144).astype(dtype)
        return lambda: bank(x0, u0, thetas).value

    T = 30
    problem = unicycle(N=T, dtype=dtype)
    ileqg = ILEQGConfig(iter_max=30, scan_unroll=10, eps_history_cap=0,
                        fused_candidate_eval=True, fused_step_optimize=True)
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)

    if entry == "ratilqr_jit":
        ce = CrossEntropyConfig(num_samples=10, iter_max=5, mu_init=0.005,
                                sigma_init=0.01, ileqg=ileqg)
        st = ratilqr.init_state(ce, dtype)
        key = jax.random.key(0)
        return lambda: ratilqr_jit.solve(problem, ce, st, x0, u0, key,
                                         0.05).value

    if entry.startswith("nm_jit"):
        depth = 3 if "depth3" in entry else 1
        refresh = "refresh" in entry
        cfg = NelderMeadConfig(theta_high_init=0.02, theta_low_init=1e-8,
                               refresh_carried_costs=refresh,
                               speculation_depth=depth, ileqg=ileqg)
        st = nelder_mead.init_state(cfg)
        return lambda: nelder_mead_jit.solve(problem, cfg, st, x0, u0,
                                             kl_bound=0.05).value

    if entry == "episode_fleet":
        # run_all.py bench_fleet_episodes fixture (256 seeds × 15 re-plans).
        from ratilqr_tpu.mpc import make_gaussian_simulator
        from ratilqr_tpu.mpc_episode import make_fleet_runner, \
            make_ileqg_plan
        cfg = ILEQGConfig(iter_max=30, scan_unroll=10, eps_history_cap=0,
                          fused_candidate_eval=True)
        fleet = make_fleet_runner(make_ileqg_plan(problem, cfg, 0.0),
                                  make_gaussian_simulator(problem), 15,
                                  problem.c)
        keys = jax.random.split(jax.random.key(0), 256)
        return lambda: fleet(x0, u0, keys, ()).total_cost

    if entry == "pets_16k":
        gen = gmm_integrator(N=50, dtype=dtype)
        cfg = PETSConfig(num_control_samples=1024,
                         num_trajectory_samples=16, num_elite=64,
                         iter_max=5, scan_unroll=10)
        st = pets_mod.init_state(
            jnp.zeros((50, 2), dtype),
            jnp.eye(2, dtype=dtype)[None].repeat(50, 0))
        solve = jax.jit(lambda x, s, k: pets_mod.solve(gen, cfg, x, s, k))
        key = jax.random.key(0)
        return lambda: solve(jnp.zeros(2, dtype), st, key).mu

    raise SystemExit(f"unknown entry {entry}")


def child(entry):
    t_start = time.perf_counter()
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    entries_before = (set(os.listdir(CACHE_DIR))
                      if os.path.isdir(CACHE_DIR) else set())
    fn = _build(entry)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn()))  # fetch: block is a no-op on axon
    t1 = time.perf_counter()
    np.asarray(jax.device_get(fn()))
    t2 = time.perf_counter()
    entries_after = (set(os.listdir(CACHE_DIR))
                     if os.path.isdir(CACHE_DIR) else set())
    wrote = sorted(entries_after - entries_before)
    # An auxiliary >0.5 s compile (a convert_element_type through a
    # congested tunnel) also writes an entry; report the names so a
    # trivial write isn't mistaken for a main-program miss.
    print(json.dumps({
        "entry": entry,
        "first_call_s": round(t1 - t0, 2),
        "second_call_s": round(t2 - t1, 3),
        "process_setup_s": round(t0 - t_start, 2),
        "cache_hit": not wrote,
        "new_cache_entries": len(wrote),
        "new_entry_names": [w.split("-")[0] for w in wrote],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entry", default=None, help="internal: child mode")
    ap.add_argument("--entries", default=",".join(ENTRIES))
    ap.add_argument("--out", default=os.path.join(
        ROOT, "benchmarks", "compile_budget.json"))
    args = ap.parse_args()
    if args.entry:
        child(args.entry)
        return

    import datetime
    records = []
    for entry in args.entries.split(","):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--entry", entry],
            capture_output=True, text=True, timeout=3600)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            rec = {"entry": entry, "error": (proc.stderr or "no output")
                   [-500:], "rc": proc.returncode}
        rec["wall_s"] = round(time.time() - t0, 1)
        records.append(rec)
        print(rec, flush=True)

    out = {
        "protocol": "each entry point first-called in a FRESH subprocess "
                    "against the committed .jax_cache (the cold-replica "
                    "deployment case); cache_hit=False means a compile "
                    "happened and its entry was written",
        "budget_first_call_s": 120,
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "entries": records,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
