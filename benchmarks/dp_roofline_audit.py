"""Where does the DP kernel's missing ~40% of roofline go? (VERDICT r4 #4)

``docs/performance.md`` has reported the fused Riccati kernel at ~60% of
its HBM roofline for two rounds (152 vs 92 µs full, 83 vs 48 µs slim at
B=2048, T=100) without naming the other 40%.  This script pins it down by
measuring the RAW kernel (``ops.riccati_pallas.riccati_bank``, no solver
wrapper, no μ-restart loop) across a grid designed to separate the three
candidate explanations:

  1. **per-call fixed cost** — vary T at fixed B: the intercept of the
     linear fit t(T) is dispatch/setup; the slope is the true per-step
     cost.
  2. **tile padding / per-tile scaling** — vary B at fixed T: cost should
     be linear in ceil(B/1024); B=256 must cost the same as B=1024.
  3. **DMA↔compute overlap** — two contrasts at fixed (B, T):
       slim-opt vs full-opt  : +44 floats/step/lane of pure OUTPUT bytes
                               at identical FLOPs → the time delta
                               measures achieved incremental stream
                               bandwidth;
       slim-opt vs slim-eval : ≈equal bytes (48 vs 47), but eval skips
                               the H Cholesky + both H-solves → the time
                               delta measures how much compute sits on
                               the critical path.  If the kernel
                               overlapped DMA with compute, equal-byte
                               variants would cost equal time.

Every cell is chained CHAIN× inside one jit with a data dependence
(per-link = (chain − single)/(CHAIN − 1)), the same anti-dispatch
protocol as profile_components.py.  Writes dp_roofline_audit.json.
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

from ratilqr_tpu.ops.approx import approximate_model
from ratilqr_tpu.ops import riccati_pallas
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.utils.profiling import time_fn

HBM_GBS = 819.0     # v5e HBM bandwidth
VPU_TOPS = 3.94e12  # v5e f32 vector peak (8 MACs × 2 × ~246 MHz × lanes)


def stream_floats(variant, n, m):
    """Floats/step/lane streamed HBM<->VMEM (w_shared: W terms are SMEM,
    not per-lane)."""
    approx_in = 1 + n + n * n + m + m * m + m * n + n * n + n * m
    if variant == "opt_slim":
        return approx_in + (m * n + m)                  # out: L, dl
    if variant == "opt_full":
        # out: s, s_vec, S, g, G, H, L, dl
        return approx_in + (1 + n + n * n + m + m * n + m * m
                            + m * n + m)
    if variant == "eval_slim":
        return approx_in + m * n                        # in: L; out: ~0
    raise ValueError(variant)


def flop_estimate(variant, n, m):
    """Unit-weight op count of the per-step algebra (mul/add/div/sqrt all
    = 1; divisions and roots are several VPU ops each, so this is a LOWER
    bound on issued vector ops — the fit below exposes the gap)."""
    chol = lambda k: k ** 3 // 3 + 2 * k * k            # chol + masks
    solve = lambda k, cols: cols * 2 * k * k
    mm = lambda p, q, r: 2 * p * q * r
    ops = 0
    ops += 2 * n * n + chol(n)                          # M, chol(M)
    ops += solve(n, n) + n * n                          # MinvS, D
    ops += mm(n, n, n)                                  # DS
    ops += 2 * m * n + mm(m, n, n) + mm(m, n, n)        # g, G (B^T DS A)
    ops += mm(m, n, m) + m * m                          # H
    if variant.startswith("opt"):
        ops += chol(m) + solve(m, n) + solve(m, 1)      # chol(H), L, dl
    ops += 3 * m + 2 * m                                # Hdl, s terms
    ops += solve(n, 1) + 2 * n + 6                      # Minv s_vec, logdet+risk
    ops += 2 * (mm(n, n, 1) + 3 * m * n)                # s_vec_new
    ops += mm(n, n, n) + mm(n, n, n) + 2 * mm(n, m, n)  # S_new
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=9)
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "dp_roofline_audit.json"))
    args = ap.parse_args()
    C = args.chain
    dtype = jnp.float32

    out = {"device": str(jax.devices()[0]), "chain": C,
           "protocol": "raw riccati_bank kernel, chained in-jit, "
                       "per-link = (chain-single)/(chain-1), best-of-5 "
                       "fetch-synced"}

    def bank_inputs(B, T):
        problem = unicycle(N=T, dtype=dtype)
        u = 0.01 * jnp.ones((T, 2), dtype)
        x = jnp.cumsum(jnp.ones((T + 1, 3), dtype) * 0.01, 0)
        a1 = approximate_model(problem, u, x)
        ab = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (B,) + l.shape), a1)
        # lane-invariant noise -> SMEM path (the solver's layout)
        ab = ab._replace(W=a1.W, W_inv=a1.W_inv, logdet_W=a1.logdet_W)
        thetas = jnp.linspace(0.0, 0.02, B).astype(dtype)
        mu = jnp.zeros((B,), dtype)
        L_in = jnp.zeros((B, T, 2, 3), dtype)
        return ab, thetas, mu, L_in

    def unit(variant, ab, thetas, mu, L_in):
        def one(feed):
            a = ab._replace(q=ab.q + feed[:, None])
            if variant == "opt_slim":
                r = riccati_pallas.riccati_bank(a, thetas, mu, slim=True)
                return (r.value + jnp.sum(r.L, axis=(1, 2, 3))
                        + jnp.sum(r.dl, axis=(1, 2))
                        + r.m_fail.astype(dtype) + r.h_fail.astype(dtype))
            if variant == "eval_slim":
                r = riccati_pallas.riccati_bank(a, thetas, mu, L_in=L_in,
                                                slim=True)
                return (r.value + r.m_fail.astype(dtype)
                        + r.h_fail.astype(dtype))
            r = riccati_pallas.riccati_bank(a, thetas, mu, slim=False)
            tot = r.s[:, 0]
            for leaf in (r.s, r.s_vec, r.S, r.g, r.G, r.H, r.L, r.dl):
                tot = tot + jnp.sum(leaf, axis=tuple(range(1, leaf.ndim)))
            return tot + r.m_fail.astype(dtype) + r.h_fail.astype(dtype)
        return one

    def measure(variant, B, T):
        ab, thetas, mu, L_in = bank_inputs(B, T)
        u = unit(variant, ab, thetas, mu, L_in)

        def chained(k):
            def fn(feed):
                for _ in range(k):
                    feed = u(feed) * 1e-30
                return feed
            return jax.jit(fn)

        feed0 = jnp.zeros((B,), dtype)
        t1 = time_fn(chained(1), feed0, reps=5)["best"]
        tc = time_fn(chained(C), feed0, reps=5)["best"]
        per_us = (tc - t1) / (C - 1) * 1e6
        tiles = max(1, (B + 1023) // 1024)
        sf = stream_floats(variant, 3, 2)
        hbm_us = tiles * 1024 * T * sf * 4 / HBM_GBS / 1e3
        vpu_us = tiles * 1024 * T * flop_estimate(variant, 3, 2) \
            / VPU_TOPS * 1e6
        cell = {"per_call_us": round(per_us, 1),
                "hbm_bound_us": round(hbm_us, 1),
                "vpu_lower_bound_us": round(vpu_us, 1),
                "sum_bounds_us": round(hbm_us + vpu_us, 1),
                "pct_hbm_roofline": round(100 * hbm_us / per_us, 1)}
        out[f"{variant}_B{B}_T{T}"] = cell
        print(f"{variant:9s} B={B:<6d} T={T:<4d} {per_us:8.1f} us  "
              f"(HBM {hbm_us:6.1f}, VPU>= {vpu_us:6.1f}, "
              f"sum {hbm_us+vpu_us:6.1f})", flush=True)
        return per_us

    # 1) T sweep at B=2048 (fixed cost vs per-step cost)
    t_sweep = {}
    for T in (25, 50, 100, 200):
        t_sweep[T] = measure("opt_slim", 2048, T)
    Ts = np.array(sorted(t_sweep))
    ys = np.array([t_sweep[t] for t in Ts])
    slope, intercept = np.polyfit(Ts, ys, 1)
    out["fit_T_B2048"] = {
        "per_step_us": round(float(slope), 3),
        "per_call_fixed_us": round(float(intercept), 1),
        "note": "t(T) linear fit over T=25..200, slim optimizing"}
    print(f"T-fit: {slope:.3f} us/step + {intercept:.1f} us fixed")

    # 2) B sweep at T=100 (tile scaling + padding)
    for B in (256, 1024, 2048, 4096, 8192):
        measure("opt_slim", B, 100)

    # 3) variant contrasts at (2048, 100)
    measure("opt_full", 2048, 100)
    measure("eval_slim", 2048, 100)

    o = out["opt_slim_B2048_T100"]
    f = out["opt_full_B2048_T100"]
    e = out["eval_slim_B2048_T100"]
    d_bytes_MB = 2 * 1024 * 100 * (
        stream_floats("opt_full", 3, 2)
        - stream_floats("opt_slim", 3, 2)) * 4 / 1e6
    d_t_us = f["per_call_us"] - o["per_call_us"]
    out["contrasts"] = {
        "full_minus_slim_us": round(d_t_us, 1),
        "full_minus_slim_MB": round(d_bytes_MB, 2),
        "achieved_incremental_GBs": round(d_bytes_MB / d_t_us * 1e3, 1)
        if d_t_us > 0 else None,
        "opt_minus_eval_us": round(o["per_call_us"] - e["per_call_us"], 1),
        "note": "full-slim: pure extra output bytes at equal FLOPs; "
                "opt-eval: ~equal bytes, eval skips chol(H)+H-solves"}

    with open(args.json, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
