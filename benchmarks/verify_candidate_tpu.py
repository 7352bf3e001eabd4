"""On-device verification of the fused candidate kernel (Mosaic, not
interpret): numerical equivalence vs the XLA folded composition plus the
chained device-time A/B that justified making it the bench default.

Protocol notes (hard-won, keep them):
  - every chained unit takes its operands as EXPLICIT jit arguments —
    closed-over (B, T, ·) arrays bake into the program as constants and
    the tunneled remote-compile endpoint rejects the body (HTTP 413) at
    B=65,536;
  - the chain feed perturbs the CANDIDATE CONTROLS, not θ: a θ-only feed
    lets XLA CSE the θ-independent rollout+quadratization across links
    and undercounts the XLA paths ~5× (measured: 2.5 vs 16.7 ms/call).

Usage (on the TPU): python benchmarks/verify_candidate_tpu.py [B]
Writes benchmarks/candidate_tpu_verification.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu.models import unicycle
from ratilqr_tpu.ops import smallmat
from ratilqr_tpu.ops.approx import approximate_folded, approximate_model
from ratilqr_tpu.ops.candidate_pallas import candidate_bank
from ratilqr_tpu.ops.riccati import dp_evaluate, dp_evaluate_folded
from ratilqr_tpu.ops.rollout import (rollout_feedback_with_jac,
                                     rollout_open_loop)
from ratilqr_tpu.utils.profiling import time_fn

T, C = 100, 9


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    dt = jnp.float32
    prob = unicycle(N=T, dtype=dt)
    key = jax.random.key
    x0s = 0.1 * jax.random.normal(key(0), (B, 3), dt)
    ls = 0.05 * jax.random.normal(key(1), (B, T, 2), dt)
    Ls = 0.05 * jax.random.normal(key(2), (B, T, 2, 3), dt)
    x_refs = jax.jit(jax.vmap(
        lambda x0, l: rollout_open_loop(prob, x0, 0.7 * l)))(x0s, ls)
    # θ mix incl. 0 and a band of infeasible lanes (failure parity).
    thetas = jnp.concatenate([
        jnp.zeros((B // 8,), dt),
        jnp.linspace(1e-4, 0.02, B - 2 * (B // 8)).astype(dt),
        jnp.full((B // 8,), 1e6, dt)])
    mus = jnp.where(jnp.arange(B) % 3 == 0, 1e-3, 0.0).astype(dt)
    ks = jnp.arange(T)
    Wm = jax.vmap(prob.W)(ks).astype(dt)
    chol = smallmat.cholesky(Wm)
    W_inv = smallmat.cho_inverse(chol)
    ldW = smallmat.cho_logdet(chol)

    def unit_fused(xr, l, L, mu, th, feed):
        out = candidate_bank(prob.tile_model, xr, l + feed[:, None, None],
                             L, mu, th, Wm, W_inv, ldW)
        return out.value + out.m_fail.astype(dt)

    def unit_folded_xla(xr, l, L, mu, th, feed):
        def one(x_ref, lc, Lg, m_, t_):
            folded = approximate_folded(prob, x_ref, lc, Lg, m_, unroll=10)
            v, f = dp_evaluate_folded(folded, theta=t_, unroll=10)
            return v + f.astype(dt)
        return jax.vmap(one)(xr, l + feed[:, None, None], L, mu, th)

    def unit_unfolded_xla(xr, l, L, mu, th, feed):
        def one(x_ref, lc, Lg, m_, t_):
            x, u, A, Bm = rollout_feedback_with_jac(prob, x_ref, lc, Lg,
                                                    unroll=10)
            ap = approximate_model(prob, u, x, A, Bm)
            v, f = dp_evaluate(ap, Lg, None, theta=t_, mu=m_, unroll=10,
                               slim=True)
            return v + f.astype(dt)
        return jax.vmap(one)(xr, l + feed[:, None, None], L, mu, th)

    out = {"device": str(jax.devices()[0]), "B": B, "T": T, "chain": C}

    # --- equivalence --------------------------------------------------
    fused = jax.jit(lambda xr, l, L, mu, th: candidate_bank(
        prob.tile_model, xr, l, L, mu, th, Wm, W_inv, ldW))
    res = fused(x_refs, ls, Ls, mus, thetas)
    v = np.asarray(jax.device_get(res.value))
    mf = np.asarray(jax.device_get(res.m_fail))

    def one_ref(x_ref, lc, Lg, m_, t_):
        folded = approximate_folded(prob, x_ref, lc, Lg, m_, unroll=10)
        return dp_evaluate_folded(folded, theta=t_, unroll=10)
    vr, fr = jax.jit(jax.vmap(one_ref))(x_refs, ls, Ls, mus, thetas)
    vr = np.asarray(jax.device_get(vr))
    fr = np.asarray(jax.device_get(fr))

    assert (mf == fr).all(), "failure-flag parity broke"
    ok = ~fr
    rel = np.abs(v[ok] - vr[ok]) / np.maximum(1e-6, np.abs(vr[ok]))
    out["n_failed_lanes"] = int(fr.sum())
    out["value_rel_dev_p50"] = float(np.percentile(rel, 50))
    out["value_rel_dev_p99"] = float(np.percentile(rel, 99))
    out["value_rel_dev_max"] = float(rel.max())
    print(f"equivalence: fail parity ok ({int(fr.sum())} failed lanes), "
          f"rel-dev p50 {out['value_rel_dev_p50']:.2e} "
          f"max {out['value_rel_dev_max']:.2e}", flush=True)

    # --- chained device-time A/B --------------------------------------
    feed0 = jnp.zeros((B,), dt)
    for name, u in (("fused_kernel", unit_fused),
                    ("folded_xla", unit_folded_xla),
                    ("unfolded_xla", unit_unfolded_xla)):
        def chained(k, u=u):
            def fn(xr, l, L, mu, th, feed):
                for _ in range(k):
                    feed = u(xr, l, L, mu, th, feed) * 1e-30
                return feed
            return jax.jit(fn)
        t1 = time_fn(chained(1), x_refs, ls, Ls, mus, thetas, feed0,
                     reps=5)["best"]
        tc = time_fn(chained(C), x_refs, ls, Ls, mus, thetas, feed0,
                     reps=5)["best"]
        per = (tc - t1) / (C - 1) * 1e3
        out[f"{name}_ms_per_call"] = round(per, 3)
        print(f"{name:14s} {per:8.3f} ms/call device", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "candidate_tpu_verification.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
