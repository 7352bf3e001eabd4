"""Decompose the warm iLEQG bank solve into per-component device costs.

The tunneled runtime charges ~27 ms per dispatch, so sub-millisecond
component costs are unresolvable by single-dispatch timing.  Each
component here is chained CHAIN times inside ONE jit with a forced data
dependence between links; the per-link cost is (chained − base)/(CHAIN−1)
where base is the single-link variant of the same program.

Components (B lanes, T=100, unicycle n=3 m=2, f32 — the bench workload):
  - rollout:      closed-loop rollout with analytic Jacobians
  - approx:       cost quadratization + W factorization (vmapped AD)
  - dp_optimize:  optimizing Riccati pass (Pallas on TPU) + mu-restart loop
  - dp_evaluate:  evaluating Riccati pass (Pallas on TPU)
  - ls_candidate: one line-search candidate = rollout + approx + dp_evaluate
  - solve_warm:   the full warm re-plan for reference (single dispatch)

Usage: python benchmarks/profile_components.py [--batch 2048] [--chain 8]
Writes benchmarks/profile_components.json.
"""
import argparse
import json
import os
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
from ratilqr_tpu.ops.approx import approximate_folded, approximate_model
from ratilqr_tpu.ops.riccati import (dp_evaluate, dp_evaluate_folded,
                                     dp_optimize)
from ratilqr_tpu.ops.rollout import rollout_feedback_with_jac
from ratilqr_tpu.solvers.ileqg import make_batched_solver
from ratilqr_tpu.utils.profiling import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "profile_components.json"))
    args = ap.parse_args()

    B, T, C = args.batch, args.T, args.chain
    dtype = jnp.float32
    problem = unicycle(N=T, dtype=dtype)
    config = ILEQGConfig(iter_max=100, scan_unroll=10,
                         adaptive_eps_init=True, eps_history_cap=0,
                         fused_candidate_eval=True,
                         fused_step_optimize=True)

    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    thetas = jnp.linspace(0.0, 0.02, B).astype(dtype)

    # Warm-start state: one cold bank solve (also warms the Pallas path).
    bank = make_batched_solver(problem, config)
    res = bank(x0, u0, thetas)
    u_warm = np.asarray(jax.device_get(res.l[0]))
    u_warm = jnp.asarray(u_warm)
    L_warm = jnp.asarray(np.asarray(jax.device_get(res.L[0])))
    xm = x0 + jnp.asarray([0.05, -0.03, 0.01], dtype)

    mu0 = jnp.zeros((B,), dtype)
    delta0 = jnp.full((B,), config.delta_0, dtype)
    xb = jnp.broadcast_to(xm, (B, 3))
    ub = jnp.broadcast_to(u_warm, (B, T, 2))
    Lb = jnp.broadcast_to(L_warm, (B, T, 2, 3))

    def chained(unit, k):
        """Apply `unit` k times with a scalar data dependence between links.

        unit(x0_b, u_b, ap, feed) -> scalar array (B,) whose value feeds
        the next link (scaled to ~0 so trajectories stay in-distribution).
        ``ap`` (the precomputed bank Approximation) is an explicit jit
        ARGUMENT: closing over it bakes a ~1 GB constant into the program,
        which the tunneled remote-compile endpoint rejects (HTTP 413) at
        B=65,536.
        """
        def fn(x0_b, u_b, ap):
            feed = jnp.zeros((B,), dtype)
            for _ in range(k):
                feed = unit(x0_b, u_b, ap, feed) * 1e-30
            return feed
        return jax.jit(fn)

    # --- units ----------------------------------------------------------
    def unit_rollout(x0_b, u_b, ap, feed):
        x, u, A, Bm = jax.vmap(
            lambda x0_, u_, f_: rollout_feedback_with_jac(
                problem, jnp.broadcast_to(x0_ + f_, (T + 1, 3)),
                u_, L_warm, unroll=config.scan_unroll)
        )(x0_b, u_b, feed)
        # Consume EVERY output: a unit that returns a slice lets XLA
        # dead-code-eliminate the rest of its work and undercount.
        return (jnp.sum(x, axis=(1, 2)) + jnp.sum(u, axis=(1, 2))
                + jnp.sum(A, axis=(1, 2, 3)) + jnp.sum(Bm, axis=(1, 2, 3)))

    def unit_approx(x0_b, u_b, ap, feed):
        # fixed nominal x-trajectory; feed perturbs u.
        xtraj = jnp.broadcast_to(xm, (T + 1, 3))
        ap_ = jax.vmap(
            lambda u_, f_: approximate_model(problem, u_ + f_, xtraj)
        )(u_b, feed)
        # Consume every field (anti-DCE, see unit_rollout).
        tot = ap_.q_term + jnp.sum(ap_.q, axis=1)
        for leaf in (ap_.q_vec, ap_.Q, ap_.r, ap_.R, ap_.P,
                     ap_.q_vec_term, ap_.Q_term):
            tot = tot + jnp.sum(leaf, axis=tuple(range(1, leaf.ndim)))
        return tot

    # Precompute one bank approximation for the DP units.  The noise-model
    # fields are lane-invariant in the solver (W depends only on the
    # problem), so vmap them as unbatched — the same shared-W SMEM path
    # the solver's Riccati dispatch takes.
    xtraj_b = jnp.broadcast_to(xm, (B, T + 1, 3))
    approx_b = jax.jit(jax.vmap(
        lambda u_, x_: approximate_model(problem, u_, x_)))(ub, xtraj_b)
    approx_b = approx_b._replace(W=approx_b.W[0], W_inv=approx_b.W_inv[0],
                                 logdet_W=approx_b.logdet_W[0])
    ap_axes = approx_b._replace(
        q=0, q_vec=0, Q=0, r=0, R=0, P=0, A=0, B=0,
        W=None, W_inv=None, logdet_W=None, q_term=0, q_vec_term=0, Q_term=0)

    def unit_dp_opt(x0_b, u_b, ap, feed):
        ap_ = ap._replace(q=ap.q + feed[:, None])
        _, L, dl, mu, delta, fail = jax.vmap(
            lambda a, th, m, d: dp_optimize(
                a, theta=th, mu=m, delta=d, mu_min=config.mu_min,
                delta_0=config.delta_0, unroll=config.scan_unroll,
                slim=True),
            in_axes=(ap_axes, 0, 0, 0))(ap_, thetas, mu0, delta0)
        # Consume every output (anti-DCE, see unit_rollout).
        return (dl[:, 0, 0] + jnp.sum(dl, axis=(1, 2))
                + jnp.sum(L, axis=(1, 2, 3)) + mu + delta
                + fail.astype(dl.dtype))

    def unit_dp_eval(x0_b, u_b, ap, feed):
        ap_ = ap._replace(q=ap.q + feed[:, None])
        value, fail = jax.vmap(
            lambda a, th, m: dp_evaluate(a, L_warm, None, theta=th, mu=m,
                                         unroll=config.scan_unroll,
                                         slim=True),
            in_axes=(ap_axes, 0, 0))(ap_, thetas, mu0)
        return value

    def unit_ls_candidate_folded(x0_b, u_b, ap, feed):
        # The opt-in fold_candidate_eval path: one rollout + a fold stage
        # emitting the 22-float folded stack, evaluated by the folded
        # kernel.  Faster HERE in isolation, slower composed into the
        # full solve (docs/performance.md "Warm re-plan device budget").
        def one(x0_, u_, th, f_):
            folded = approximate_folded(
                problem, jnp.broadcast_to(x0_ + f_, (T + 1, 3)), u_,
                L_warm, jnp.zeros((), dtype), unroll=config.scan_unroll)
            value, fail = dp_evaluate_folded(folded, theta=th,
                                             unroll=config.scan_unroll)
            return value
        return jax.vmap(one)(x0_b, u_b, thetas, feed)

    def unit_ls_candidate(x0_b, u_b, ap, feed):
        # The pre-round-5 default candidate path (XLA composition).
        def one(x0_, u_, th, f_):
            x, u, A, Bm = rollout_feedback_with_jac(
                problem, jnp.broadcast_to(x0_ + f_, (T + 1, 3)), u_,
                L_warm, unroll=config.scan_unroll)
            ap_ = approximate_model(problem, u, x, A, Bm)
            value, fail = dp_evaluate(ap_, L_warm, None, theta=th,
                                      mu=jnp.zeros((), dtype),
                                      unroll=config.scan_unroll, slim=True)
            return value
        return jax.vmap(one)(x0_b, u_b, thetas, feed)

    def unit_ls_candidate_fused(x0_b, u_b, ap, feed):
        # The round-5 fused candidate kernel (bench.py default): the
        # whole trial as one Mosaic program, feed through the controls.
        from ratilqr_tpu.ops.candidate_pallas import candidate_value
        def one(x0_, u_, th, f_):
            v, fail = candidate_value(
                problem, jnp.broadcast_to(x0_, (T + 1, 3)),
                u_ + f_, L_warm, jnp.zeros((), dtype), th,
                unroll=config.scan_unroll)
            return v
        return jax.vmap(one)(x0_b, u_b, thetas, feed)

    def unit_step_fused(x0_b, u_b, ap, feed):
        # The round-5 fused STEP kernel (rollout + quadratize +
        # optimizing DP as one Mosaic program, ops/step_pallas.py) —
        # replaces the rollout + approx + dp_optimize trio AND their
        # stage-boundary HBM materialization (the audit's ~10 ms/iter).
        from ratilqr_tpu.ops.step_pallas import step_optimize
        def one(x0_, u_, th, f_):
            x, value, L, dl, mu, delta, failed = step_optimize(
                problem, x0_, u_ + f_, theta=th,
                mu=jnp.zeros((), dtype),
                delta=jnp.asarray(config.delta_0, dtype),
                mu_min=config.mu_min, delta_0=config.delta_0,
                unroll=config.scan_unroll)
            # Consume every output (anti-DCE, see unit_rollout).
            return (value + jnp.sum(x) + jnp.sum(L) + jnp.sum(dl)
                    + mu + delta + failed.astype(dtype))
        return jax.vmap(one)(x0_b, u_b, thetas, feed)

    units = {
        "rollout": unit_rollout,
        "approx": unit_approx,
        "dp_optimize": unit_dp_opt,
        "dp_evaluate": unit_dp_eval,
        "ls_candidate": unit_ls_candidate,
        "ls_candidate_folded": unit_ls_candidate_folded,
        "ls_candidate_fused": unit_ls_candidate_fused,
        "step_fused": unit_step_fused,
    }

    out = {"batch": B, "T": T, "chain": C,
           "device": str(jax.devices()[0]),
           "note": "per-link ms = (chain - single)/(C-1); single-dispatch "
                   "latency includes the ~27 ms tunnel round trip"}

    for name, unit in units.items():
        t_single = time_fn(chained(unit, 1), xb, ub, approx_b, reps=5)
        t_chain = time_fn(chained(unit, C), xb, ub, approx_b, reps=5)
        per_link_ms = (t_chain["best"] - t_single["best"]) / (C - 1) * 1e3
        out[f"{name}_ms_per_call"] = round(per_link_ms, 4)
        out[f"{name}_single_dispatch_ms"] = round(t_single["best"] * 1e3, 3)
        print(f"{name:14s} {per_link_ms:8.3f} ms/call  "
              f"(single dispatch {t_single['best']*1e3:7.2f} ms)")

    t_solve = time_fn(lambda th: bank(xm, u_warm, th).value, thetas, reps=5)
    out["solve_warm_single_dispatch_ms"] = round(t_solve["best"] * 1e3, 3)
    iters = int(np.median(np.asarray(jax.device_get(
        bank(xm, u_warm, thetas).iterations))))
    out["solve_warm_median_iters"] = iters
    print(f"{'solve_warm':14s} {t_solve['best']*1e3:8.2f} ms/dispatch  "
          f"(median {iters} iters)")

    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
