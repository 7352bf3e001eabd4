"""Full benchmark/parity harness (SURVEY.md §7 step 9).

Produces a JSON report covering:
  - ileqg_solves_per_s          batched iLEQG throughput at T=100 (headline)
  - ratilqr_mpc_step_p50_ms     RAT iLQR re-plan latency, p50 over steps
  - pets_generations_per_s      fully-jitted PETS CEM generation rate
  - scaling_efficiency_8dev     sharded θ-bank on 8 virtual CPU devices vs 1
                                (run with BENCH_SCALING=1; forces CPU)

Usage: python benchmarks/run_all.py [--json out.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("BENCH_SCALING") != "1":
    # TPU-only: reloading cached XLA:CPU AOT executables segfaults on this
    # VM (machine-feature mismatch), so no cache for the CPU scaling run.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def bench_ileqg_throughput(batch=2048, T=100):
    """Cold start (every lane iterates to convergence from a zero schedule)
    and warm-started MPC re-planning, each in two solver configs: the
    reference-default algorithm (fixed ε_init, ``adaptive_ϵ_init=false``,
    ``ileqg.jl:193``) and the tuned config with the reference's adaptive-ε
    feature enabled.  Both run with per-lane trial diagnostics off
    (``eps_history_cap=0`` — ``eps_count`` stays exact)."""
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.solvers.ileqg import make_batched_solver
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    thetas = jnp.linspace(0.0, 0.02, batch).astype(dtype)

    out = {}
    for tag, adaptive in (("", False), ("_adaptive", True)):
        bank = make_batched_solver(problem, ILEQGConfig(
            scan_unroll=10, eps_history_cap=0, adaptive_eps_init=adaptive,
            fused_candidate_eval=True))
        stats = time_fn(lambda th: bank(x0, u0, th).value, thetas, reps=3)
        out[f"ileqg_cold{tag}_solves_per_s"] = batch / stats["best"]
        out[f"ileqg_cold{tag}_bank_latency_ms"] = stats["best"] * 1e3
        if not tag:
            out["ileqg_compile_s"] = stats["compile"]
        u_warm = bank(x0, u0, thetas).l[0]
        xm = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)
        stats = time_fn(lambda th: bank(xm, u_warm, th).value, thetas,
                        reps=3)
        out[f"ileqg_warm{tag}_solves_per_s"] = batch / stats["best"]
        out[f"ileqg_warm{tag}_bank_latency_ms"] = stats["best"] * 1e3
    return out


def bench_ratilqr_mpc(T=30, steps=10):
    """RAT iLQR re-plan latency, host vs fully-jitted, in two inner-solver
    configs: the fixed-ε line search (reference default,
    ``adaptive_ϵ_init=false``) and the reference's adaptive-ε feature
    (``ileqg.jl:582-591``) which warm re-plans exploit heavily."""
    from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.mpc import MPCDriver
    from ratilqr_tpu.solvers import ratilqr, ratilqr_jit
    from ratilqr_tpu.solvers.ratilqr import RATiLQRSolver

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    out = {}
    for tag, adaptive in (("", False), ("_adaptive", True)):
        config = CrossEntropyConfig(
            num_samples=10, iter_max=5, mu_init=0.005, sigma_init=0.01,
            ileqg=ILEQGConfig(iter_max=30, scan_unroll=10,
                              adaptive_eps_init=adaptive,
                              fused_candidate_eval=True,
                              eps_history_cap=0 if adaptive else 256))
        if not adaptive:  # host-orchestrated path: fixed-ε config only
            solver = RATiLQRSolver(problem, config)
            driver = MPCDriver(
                problem=problem,
                plan=lambda x, u, key: solver.solve(x, u, key,
                                                    kl_bound=0.05))
            recs = driver.run(jnp.zeros(3, dtype), jnp.zeros((T, 2), dtype),
                              jax.random.key(0), num_steps=steps)
            lat = sorted(r.plan_time_s for r in recs[1:])  # drop compile
            out["ratilqr_mpc_step_p50_ms"] = 1e3 * lat[len(lat) // 2]
            out["ratilqr_mpc_step_best_ms"] = 1e3 * lat[0]

        # Single-dispatch fully-jitted RAT iLQR (one program per re-plan).
        class JitPlan:
            def __init__(self, config):
                self.config = config
                self.state = ratilqr.init_state(config, dtype)

            def __call__(self, x, u, key):
                res = ratilqr_jit.solve(problem, self.config, self.state,
                                        x, u, key, jnp.asarray(0.05, dtype))
                self.state = res.state
                return res

        driver = MPCDriver(problem=problem, plan=JitPlan(config))
        recs = driver.run(jnp.zeros(3, dtype), jnp.zeros((T, 2), dtype),
                          jax.random.key(0), num_steps=steps)
        lat = sorted(r.plan_time_s for r in recs[1:])
        out[f"ratilqr_jit{tag}_mpc_step_p50_ms"] = 1e3 * lat[len(lat) // 2]
        out[f"ratilqr_jit{tag}_mpc_step_best_ms"] = 1e3 * lat[0]
    return out


def bench_nm_mpc(T=30, steps=10):
    """RAT iLQR++ re-plan latency: host-orchestrated vs fully-jitted
    (speculative-bank) Nelder-Mead, same warm-started MPC loop as
    ``bench_ratilqr_mpc``."""
    from ratilqr_tpu import ILEQGConfig, NelderMeadConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.mpc import MPCDriver
    from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    out = {}
    # cfg_tag → (adaptive ε, refresh_carried_costs, speculation_depth).
    # ``_refresh`` is the opt-in fix for the reference's stale-carried-cost
    # quirk (see NelderMeadConfig.refresh_carried_costs): warm re-plans
    # converge in single-digit NM iterations instead of burning
    # iter_max=100.  ``_spec3`` evaluates 3 NM iterations' candidate trees
    # per bank (942 lanes = one Pallas tile), cutting the sequential
    # dispatch chain 3x at identical decisions — with reference semantics
    # AND combined with refresh (the headline latency config).
    for cfg_tag, (adaptive, refresh, depth) in (
            ("", (False, False, 1)), ("_adaptive", (True, False, 1)),
            ("_refresh", (False, True, 1)),
            ("_spec3", (False, False, 3)),
            ("_refresh_spec3", (False, True, 3))):
        config = NelderMeadConfig(
            theta_high_init=0.02, theta_low_init=1e-8,
            refresh_carried_costs=refresh, speculation_depth=depth,
            ileqg=ILEQGConfig(iter_max=30, scan_unroll=10,
                              adaptive_eps_init=adaptive,
                              fused_candidate_eval=True,
                              eps_history_cap=0 if adaptive else 256))
        variants = [("nm_jit", nelder_mead_jit.solve)]
        if cfg_tag == "":  # host-orchestrated path: reference config only
            variants.insert(0, ("nm", nelder_mead.solve))
        for tag, solve_fn in variants:
            class Plan:
                def __init__(self, fn):
                    self.fn = fn
                    self.state = nelder_mead.init_state(config)

                def __call__(self, x, u, key):
                    res = self.fn(problem, config, self.state, x, u,
                                  kl_bound=0.05)
                    self.state = res.state
                    return res

            driver = MPCDriver(problem=problem, plan=Plan(solve_fn))
            recs = driver.run(jnp.zeros(3, dtype), jnp.zeros((T, 2), dtype),
                              jax.random.key(0), num_steps=steps)
            lat = sorted(r.plan_time_s for r in recs[2:])  # drop compiles
            out[f"{tag}{cfg_tag}_mpc_step_p50_ms"] = (
                1e3 * lat[len(lat) // 2])
            out[f"{tag}{cfg_tag}_mpc_step_best_ms"] = 1e3 * lat[0]
    return out


def bench_fleet_episodes(T=30, steps=15, seeds=256):
    """On-device Monte-Carlo closed-loop evaluation: ``seeds`` full
    receding-horizon episodes (one iLEQG re-plan per step) as ONE
    vmapped ``lax.scan`` dispatch (``mpc_episode.make_fleet_runner``),
    vs the per-re-plan-dispatch host loop (``MPCDriver``)."""
    from ratilqr_tpu import ILEQGConfig, ileqg_solve
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.mpc import MPCDriver
    from ratilqr_tpu.mpc_episode import (make_episode_runner,
                                         make_fleet_runner,
                                         make_gaussian_simulator,
                                         make_ileqg_plan)
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    cfg = ILEQGConfig(iter_max=30, scan_unroll=10, eps_history_cap=0,
                      fused_candidate_eval=True)
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    keys = jax.random.split(jax.random.key(0), seeds)

    fleet = make_fleet_runner(make_ileqg_plan(problem, cfg, 0.0),
                              make_gaussian_simulator(problem), steps,
                              problem.c)
    stats = time_fn(lambda ks: fleet(x0, u0, ks, ()).total_cost, keys,
                    reps=3)
    out = {"fleet_episodes_per_s": seeds / stats["best"],
           "fleet_replans_per_s": seeds * steps / stats["best"],
           "fleet_compile_s": stats["compile"]}

    # Host-loop comparator: one episode, one dispatch per re-plan.
    driver = MPCDriver(problem=problem,
                       plan=lambda x, u, k: ileqg_solve(problem, cfg, x, u,
                                                        jnp.zeros((), dtype)))
    driver.run(x0, u0, jax.random.key(0), num_steps=2)  # compile
    t0 = time.perf_counter()
    driver.run(x0, u0, jax.random.key(1), num_steps=steps)
    dt = time.perf_counter() - t0
    out["hostloop_episodes_per_s"] = 1.0 / dt
    out["fleet_speedup_vs_hostloop"] = (
        out["fleet_episodes_per_s"] * dt)
    return out


def bench_ratilqr_fleet(T=30, steps=10, seeds=64):
    """Monte-Carlo closed-loop evaluation of the FLAGSHIP controller:
    ``seeds`` episodes of fully-jitted RAT iLQR re-planning (5 CE
    generations × 10 θ-samples + final solve per re-plan) as one vmapped
    scan — the paper's model-mismatch study shape, on-device."""
    from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.mpc_episode import (make_fleet_runner,
                                         make_gaussian_simulator,
                                         make_ratilqr_plan)
    from ratilqr_tpu.solvers import ratilqr
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    cfg = CrossEntropyConfig(
        num_samples=10, iter_max=5, mu_init=0.005, sigma_init=0.01,
        ileqg=ILEQGConfig(iter_max=30, scan_unroll=10, eps_history_cap=0,
                          fused_candidate_eval=True))
    fleet = make_fleet_runner(make_ratilqr_plan(problem, cfg, 0.05),
                              make_gaussian_simulator(problem), steps,
                              problem.c)
    keys = jax.random.split(jax.random.key(0), seeds)
    state0 = ratilqr.init_state(cfg, dtype)
    stats = time_fn(
        lambda ks: fleet(jnp.zeros(3, dtype), jnp.zeros((T, 2), dtype),
                         ks, state0).total_cost, keys, reps=3)
    return {"ratilqr_fleet_episodes_per_s": seeds / stats["best"],
            "ratilqr_fleet_replans_per_s": seeds * steps / stats["best"],
            "ratilqr_fleet_compile_s": stats["compile"]}


def bench_pets(T=50, K=256, M=16, prefix="pets", unroll=1):
    from ratilqr_tpu import PETSConfig
    from ratilqr_tpu.models import gmm_integrator
    from ratilqr_tpu.solvers import pets
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    prob = gmm_integrator(N=T, dtype=dtype)
    config = PETSConfig(num_control_samples=K, num_trajectory_samples=M,
                        num_elite=32, iter_max=5, scan_unroll=unroll)
    state = pets.init_state(jnp.zeros((T, 2), dtype),
                            jnp.eye(2, dtype=dtype)[None].repeat(T, 0))
    x0 = jnp.zeros(2, dtype)
    stats = time_fn(
        lambda k: pets.solve(prob, config, x0, state, k).mu,
        jax.random.key(0), reps=3)
    gens = config.iter_max / stats["best"]
    return {f"{prefix}_generations_per_s": gens,
            f"{prefix}_rollouts_per_s": gens * K * M,
            f"{prefix}_rollouts_per_gen": K * M,
            f"{prefix}_compile_s": stats["compile"]}


def bench_models_scaling(batch=2048):
    """iLEQG bank throughput across the model-size range (state dim 3 →
    12): pins how the lane-tiled Riccati path scales with (n, m), not
    just the n=3 unicycle headline."""
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.models import cartpole, quadrotor, unicycle
    from ratilqr_tpu.solvers.ileqg import make_batched_solver
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    cases = {
        "unicycle_n3": (unicycle(N=100, dtype=dtype), 3, 2, 0.02),
        "cartpole_n4": (cartpole(N=50, dtype=dtype), 4, 1, 0.05),
        "quadrotor_n12": (quadrotor(N=50, dtype=dtype), 12, 4, 0.01),
    }
    out = {}
    for tag, (prob, n, m, th_max) in cases.items():
        T = prob.N
        bank = make_batched_solver(prob, ILEQGConfig(
            scan_unroll=10, eps_history_cap=0, adaptive_eps_init=True,
            fused_candidate_eval=True))
        x0 = jnp.zeros(n, dtype)
        u0 = jnp.zeros((T, m), dtype)
        thetas = jnp.linspace(0.0, th_max, batch).astype(dtype)
        u_warm = bank(x0, u0, thetas).l[0]
        stats = time_fn(lambda th: bank(x0, u_warm, th).value, thetas,
                        reps=3)
        out[f"ileqg_warm_{tag}_solves_per_s"] = batch / stats["best"]
    return out


def bench_bank_scaling(T=100, batches=(16384, 65536, 131072, 262144)):
    """Warm single-dispatch bank throughput vs bank size — regenerates the
    ``ileqg_warm_B*`` keys (advisor round 2: these were hand-edited into
    the artifact and a regeneration would have silently dropped them).
    Same solver config as ``bench.py``; the knee of this curve picks
    bench.py's default batch."""
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.solvers.ileqg import make_batched_solver
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    bank = make_batched_solver(problem, ILEQGConfig(
        iter_max=100, d_tol=1e-2, scan_unroll=10, adaptive_eps_init=True,
        eps_history_cap=0, fused_candidate_eval=True))
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    xm = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)
    out = {}
    for batch in batches:
        thetas = jnp.linspace(0.0, 0.02, batch).astype(dtype)
        u_warm = bank(x0, u0, thetas).l[0]
        stats = time_fn(lambda th: bank(xm, u_warm, th).value, thetas,
                        reps=3)
        out[f"ileqg_warm_B{batch}_solves_per_s"] = round(
            batch / stats["best"], 1)
    out["bank_scaling_note"] = (
        "single-dispatch warm bank throughput vs bank size (bench.py "
        "config); bench.py default batch sits at the knee of this curve")
    return out


def bench_scaling_cpu():
    """Sharding overhead on the 8-virtual-device CPU mesh.

    Virtual devices share the host's cores (XLA already multithreads the
    single-device run), so a speedup is not measurable here; what this
    pins down is the *partitioning/communication overhead* of the sharded
    program vs the unsharded one on identical silicon.  Real multi-chip
    scaling rides ICI with one top_k gather per generation — the sharded
    == unsharded equivalence is covered by tests/test_parallel.py."""
    from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig
    from ratilqr_tpu.models import unicycle
    from ratilqr_tpu.parallel import make_mesh, make_sharded_theta_cost_fn
    from ratilqr_tpu.utils.profiling import time_fn

    dtype = jnp.float32
    T, B = 50, 64
    problem = unicycle(N=T, dtype=dtype)
    config = CrossEntropyConfig(ileqg=ILEQGConfig(iter_max=10))
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    thetas = jnp.linspace(0.0, 0.02, B).astype(dtype)

    out = {}
    times = {}
    for n in (1, 8):
        mesh = make_mesh(n_devices=n)
        fn = make_sharded_theta_cost_fn(problem, config, mesh)
        stats = time_fn(lambda th: fn(x0, u0, th, 0.1), thetas, reps=3)
        times[n] = stats["best"]
    out["sharding_relative_time_8dev"] = times[8] / times[1]
    out["sharding_overhead_pct"] = 100.0 * (times[8] / times[1] - 1.0)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None)
    parser.add_argument("--skip", default="",
                        help="comma list: ileqg,mpc,nm,fleet,modelsizes,"
                             "banks,pets,scaling")
    args = parser.parse_args()
    skip = set(args.skip.split(","))

    if os.environ.get("BENCH_SCALING") == "1":
        # Must flip BEFORE the first backend touch (the axon hook forces
        # jax_platforms="axon,cpu" and clearing after init does not stick).
        jax.config.update("jax_platforms", "cpu")

    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}
    if os.environ.get("BENCH_SCALING") == "1":
        results.update(bench_scaling_cpu())
    else:
        if "ileqg" not in skip:
            results.update(bench_ileqg_throughput())
        if "mpc" not in skip:
            results.update(bench_ratilqr_mpc())
        if "nm" not in skip:
            results.update(bench_nm_mpc())
        if "fleet" not in skip:
            results.update(bench_fleet_episodes())
            results.update(bench_ratilqr_fleet())
        if "modelsizes" not in skip:
            results.update(bench_models_scaling())
        if "banks" not in skip:
            results.update(bench_bank_scaling())
        if "pets" not in skip:
            results.update(bench_pets())
            # Reference-scale workload: 16,384 rollouts/generation, the
            # BASELINE.json "10k+ rollouts/iteration" config.
            results.update(bench_pets(K=1024, M=16, prefix="pets_16k"))
            # Tuned rollout config (bit-identical results): scan_unroll=10
            # fuses 10 time steps per scan round — see docs/performance.md
            # "PETS roofline" for the measured device-only budget.
            results.update(bench_pets(K=1024, M=16, prefix="pets_16k_tuned",
                                      unroll=10))
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
