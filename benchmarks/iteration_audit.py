"""Attribute the warm-solve residual: forced-iteration marginal costs.

The post-fused budget (docs/performance.md "Warm re-plan device budget at
the headline bank") accounts ~44 ms of the ~69 ms device time and
attributes the ~25 ms residual to "outer-loop carry-select masking".
Two direct measurements test that attribution:

1. ``carry_layout_probe.py`` times the batching-rule select sweep itself
   on the exact carried shapes: 2.23 ms/round at B=65,536 — so two
   iterations of loop-mask selects cost ~4.5 ms, NOT 25 ms (and XLA
   already lays the carry out B-minor, ``{0,2,1:T(2,128)}``, so there is
   no padding tax to reclaim; the flat-layout variant measures identical).

2. This script pins the true marginal cost of one outer iteration by
   forcing the iteration count: with ``d_tol=1e-38`` the convergence test
   ``d_current < d_tol`` is never true for nonzero f32 d, so ``iter_max=k`` executes
   exactly k iterations (the extra iterations' line searches accept on
   the first trial — the candidate value isapprox-equals the converged
   value).  t(k+1) − t(k) is one full iteration including its share of
   select sweeps, relayouts, and dispatch gaps — everything the isolated
   component units cannot see.

Usage: python benchmarks/iteration_audit.py [--batch 65536]
Writes benchmarks/iteration_audit.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import ILEQGConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.ops.rollout import rollout_feedback
from ratilqr_tpu.solvers.ileqg import make_batched_solver
from ratilqr_tpu.utils.profiling import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--fused-step", action="store_true",
                    help="audit the fused-step config instead (writes "
                         "iteration_audit_fused.json by default): the "
                         "post-kernel marginal, for contrast with the "
                         "pre-kernel artifact that motivated it")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.json is None:
        name = ("iteration_audit_fused.json" if args.fused_step
                else "iteration_audit.json")
        args.json = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), name)

    B, T = args.batch, args.T
    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    base = dict(scan_unroll=10, adaptive_eps_init=True, eps_history_cap=0,
                fused_candidate_eval=True,
                fused_step_optimize=args.fused_step)

    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    thetas = jnp.linspace(0.0, 0.02, B).astype(dtype)

    # Warm-start controls from one converged cold solve.
    bank0 = make_batched_solver(problem, ILEQGConfig(iter_max=100, **base))
    res = bank0(x0, u0, thetas)
    u_warm = jnp.asarray(np.asarray(jax.device_get(res.l[0])))
    L_warm = jnp.asarray(np.asarray(jax.device_get(res.L[0])))
    xm = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)

    out = {"batch": B, "T": T, "device": str(jax.devices()[0]),
           "note": "forced-k: d_tol=1e-38 so iter_max=k executes exactly k "
                   "iterations; marginal = t(k+1)-t(k), single-dispatch "
                   "times include the ~27 ms tunnel round trip"}

    times = {}
    for k in (1, 2, 3):
        # d_tol must be > 0 (config validation mirrors the reference);
        # 1e-38 is never reached by a nonzero f32 d_current, so iter_max
        # alone sets the executed count (asserted below).
        cfg = ILEQGConfig(iter_max=k, d_tol=1e-38, **base)
        bank = make_batched_solver(problem, cfg)
        t = time_fn(lambda th, b=bank: b(xm, u_warm, th).value, thetas,
                    reps=5)
        iters = int(np.median(np.asarray(jax.device_get(
            bank(xm, u_warm, thetas).iterations))))
        assert iters == k, f"forced-{k} ran {iters} iterations"
        times[k] = t["best"]
        out[f"forced_{k}_iter_ms"] = round(t["best"] * 1e3, 3)
        print(f"forced {k} iters: {t['best']*1e3:8.2f} ms/dispatch")

    out["marginal_iter2_ms"] = round((times[2] - times[1]) * 1e3, 3)
    out["marginal_iter3_ms"] = round((times[3] - times[2]) * 1e3, 3)
    print(f"marginal iteration cost: {out['marginal_iter2_ms']} ms (2-1), "
          f"{out['marginal_iter3_ms']} ms (3-2)")

    # The normal warm solve (converges at 2 iterations) for reference.
    bank_n = make_batched_solver(problem, ILEQGConfig(iter_max=100, **base))
    t_n = time_fn(lambda th: bank_n(xm, u_warm, th).value, thetas, reps=5)
    out["warm_converged_ms"] = round(t_n["best"] * 1e3, 3)
    print(f"warm converged (2 iters): {t_n['best']*1e3:8.2f} ms/dispatch")

    # The re-materialization rollout (plain feedback rollout, no jacs) —
    # the "≈3 ms" estimate in the budget table, now measured.  Chained
    # links with a control-feed dependence (same anti-CSE discipline as
    # profile_components.py).
    xb = jnp.broadcast_to(xm, (B, 3))
    ub = jnp.broadcast_to(u_warm, (B, T, 2))

    def chained(k):
        def fn(x0_b, u_b):
            feed = jnp.zeros((B,), dtype)
            for _ in range(k):
                x, u = jax.vmap(
                    lambda x0_, u_, f_: rollout_feedback(
                        problem, jnp.broadcast_to(x0_, (T + 1, 3)),
                        u_ + f_, L_warm))(x0_b, u_b, feed)
                feed = (jnp.sum(x, axis=(1, 2))
                        + jnp.sum(u, axis=(1, 2))) * 1e-30
            return feed
        return jax.jit(fn)

    t1 = time_fn(chained(1), xb, ub, reps=5)
    t8 = time_fn(chained(8), xb, ub, reps=5)
    out["rollout_feedback_ms_per_call"] = round(
        (t8["best"] - t1["best"]) / 7 * 1e3, 4)
    print(f"rollout_feedback (re-mat): "
          f"{out['rollout_feedback_ms_per_call']} ms/call")

    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
