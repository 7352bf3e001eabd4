"""Device-only MPC re-plan time: RAT iLQR vs RAT iLQR++ without dispatch.

The single-dispatch p50s in ``results_tpu.json`` include the tunneled
runtime's ~27-30 ms host↔device round trip, which dominates BOTH bilevel
solvers at the unicycle fixture and masks their real difference.  This
script chains K sequential warm re-plans inside ONE dispatch (the episode
runner: re-plan → simulate → shift, ``mpc_episode.make_episode_runner``)
and differences two K values, so dispatch latency and per-episode fixed
costs cancel — the remaining slope is pure device time per re-plan, the
number that matters on production runtimes where dispatch is ~100 µs.

Configurations measured:
  - ratilqr_jit: 5 CE generations × 10 θ + final solve per re-plan.
  - nm refresh depth=1: the stale-carried-cost fix
    (``refresh_carried_costs=True``) — warm re-plans converge in 5-8 NM
    iterations of 6-lane banks, no final solve (speculative final).
  - nm refresh depth=3: adds 942-lane 3-step speculation — WINS only
    when dispatch-bound (fewer sequential rounds), LOSES on device (each
    wide bank pays worst-lane inner iterations over wild speculative θs).
  - nm stale-c (reference semantics): burns iter_max=100 every re-plan.

Usage (on the TPU): python benchmarks/replan_device.py
Writes benchmarks/replan_device.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, NelderMeadConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.mpc_episode import (make_episode_runner,
                                     make_gaussian_simulator, make_nm_plan,
                                     make_ratilqr_plan)
from ratilqr_tpu.solvers import nelder_mead_jit, ratilqr
from ratilqr_tpu.utils.profiling import time_fn

T = 30
K_LO, K_HI = 8, 40


def main():
    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    # Both round-5 fused kernels on — the same inner-solver config the
    # headline bench runs (the NM/CE banks are small, but the fused
    # programs collapse the per-iteration XLA stage chain, which is what
    # latency-bound small banks pay for).
    ileqg = ILEQGConfig(iter_max=30, scan_unroll=10, eps_history_cap=0,
                        fused_candidate_eval=True, fused_step_optimize=True)
    sim = make_gaussian_simulator(problem)
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)

    out = {"device": str(jax.devices()[0]), "T": T,
           "protocol": f"ms/replan = (t({K_HI} replans) - t({K_LO} "
                       f"replans))/{K_HI - K_LO}, each a best-of-5 "
                       "fetch-synced single dispatch of the episode "
                       "runner (re-plan + simulate + shift per step)"}

    def measure(key, plan, state0):
        ts = {}
        for K in (K_LO, K_HI):
            run = make_episode_runner(plan, sim, K, problem.c)
            f = jax.jit(lambda k, st: run(x0, u0, k, st).total_cost)
            ts[K] = time_fn(f, jax.random.key(0), state0, reps=5)["best"]
        per_ms = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO) * 1e3
        out[key] = round(per_ms, 3)
        print(f"{key}: {per_ms:.3f} ms/replan device", flush=True)

    ce = CrossEntropyConfig(num_samples=10, iter_max=5, mu_init=0.005,
                            sigma_init=0.01, ileqg=ileqg)
    measure("ratilqr_jit_replan_device_ms",
            make_ratilqr_plan(problem, ce, 0.05),
            ratilqr.init_state(ce, dtype))

    for key, depth, refresh in (
            ("nm_jit_refresh_replan_device_ms", 1, True),
            ("nm_jit_refresh_spec3_replan_device_ms", 3, True),
            ("nm_jit_replan_device_ms", 1, False)):
        cfg = NelderMeadConfig(theta_high_init=0.02, theta_low_init=1e-8,
                               refresh_carried_costs=refresh,
                               speculation_depth=depth, ileqg=ileqg)
        st = nelder_mead_jit.bootstrap_state(problem, cfg, x0, u0,
                                             kl_bound=0.05)
        measure(key, make_nm_plan(problem, cfg, 0.05), st)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "replan_device.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
