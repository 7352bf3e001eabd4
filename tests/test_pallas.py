"""Pallas Riccati bank kernel tests (interpret mode on CPU).

On TPU the same kernel compiles via Mosaic; equivalence there is exercised
by bench.py and the recorded artifact benchmarks/pallas_tpu_verification.json
(produced on the real chip by benchmarks/verify_pallas_tpu.py).  Numerics
note: on real TPU the kernel is *tighter* than the XLA scan path in f32
(p50 gain rel-dev vs an f64 oracle ~5e-5, vs the scan's reduced-precision
matmul drift — see the artifact).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu.models import unicycle
from ratilqr_tpu.ops.approx import approximate_model
from ratilqr_tpu.ops.riccati import _riccati_core
from ratilqr_tpu.ops.riccati_pallas import riccati_bank
from ratilqr_tpu.ops.rollout import rollout_open_loop_with_jac

T, B = 7, 5


@pytest.fixture
def bank_inputs():
    dt = jnp.float32
    prob = unicycle(N=T, dtype=dt)
    x0s = 0.1 * jax.random.normal(jax.random.key(0), (B, 3), dt)
    us = 0.1 * jax.random.normal(jax.random.key(1), (B, T, 2), dt)
    thetas = jnp.array([0.0, 0.01, 0.05, 0.1, 0.02], dt)
    mus = jnp.array([0.0, 0.0, 1e-3, 0.0, 0.0], dt)

    def make_ap(x0, u):
        x, A, Bm = rollout_open_loop_with_jac(prob, x0, u)
        return approximate_model(prob, u, x, A, Bm)

    return jax.vmap(make_ap)(x0s, us), thetas, mus


def test_kernel_matches_scan_optimizing(bank_inputs):
    ap_b, thetas, mus = bank_inputs
    ref = jax.vmap(
        lambda ap, th, mu: _riccati_core(ap, th, mu, None, None))(
            ap_b, thetas, mus)
    dp_ref, L_ref, dl_ref, mf_ref, hf_ref = ref
    out = riccati_bank(ap_b, thetas, mus)
    np.testing.assert_allclose(np.asarray(out.s[:, 0]),
                               np.asarray(dp_ref.s[:, 0]), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out.L), np.asarray(L_ref),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.dl), np.asarray(dl_ref),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.m_fail),
                                  np.asarray(mf_ref))
    np.testing.assert_array_equal(np.asarray(out.h_fail),
                                  np.asarray(hf_ref))


def test_kernel_matches_scan_evaluating(bank_inputs):
    # Evaluating mode under fixed (slightly perturbed, hence suboptimal)
    # gains — every output compared, not just the scalar value.
    ap_b, thetas, mus = bank_inputs
    _, L_opt, dl_opt, _, _ = jax.vmap(
        lambda ap, th, mu: _riccati_core(ap, th, mu, None, None))(
            ap_b, thetas, mus)
    L_fix = L_opt + 0.05 * jax.random.normal(jax.random.key(2),
                                             L_opt.shape, L_opt.dtype)
    dl_fix = dl_opt + 0.05 * jax.random.normal(jax.random.key(3),
                                               dl_opt.shape, dl_opt.dtype)
    dp_ref, _, _, mf_ref, hf_ref = jax.vmap(
        lambda ap, th, mu, L, dl: _riccati_core(ap, th, mu, L, dl))(
            ap_b, thetas, mus, L_fix, dl_fix)
    out = riccati_bank(ap_b, thetas, mus, L_fix, dl_fix)
    tol = dict(rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.s),
                               np.asarray(dp_ref.s[:, :-1]), **tol)
    np.testing.assert_allclose(np.asarray(out.s_vec),
                               np.asarray(dp_ref.s_vec[:, :-1]), **tol)
    np.testing.assert_allclose(np.asarray(out.S),
                               np.asarray(dp_ref.S[:, :-1]), **tol)
    np.testing.assert_allclose(np.asarray(out.g), np.asarray(dp_ref.g),
                               **tol)
    np.testing.assert_allclose(np.asarray(out.G), np.asarray(dp_ref.G),
                               **tol)
    np.testing.assert_allclose(np.asarray(out.H), np.asarray(dp_ref.H),
                               **tol)
    np.testing.assert_array_equal(np.asarray(out.m_fail),
                                  np.asarray(mf_ref))
    np.testing.assert_array_equal(np.asarray(out.h_fail),
                                  np.asarray(hf_ref))


def test_kernel_slim_matches_full_optimizing(bank_inputs):
    # Slim mode writes only (value, L, dl, fails); identical math.
    ap_b, thetas, mus = bank_inputs
    full = riccati_bank(ap_b, thetas, mus)
    slim = riccati_bank(ap_b, thetas, mus, slim=True)
    np.testing.assert_array_equal(np.asarray(slim.value),
                                  np.asarray(full.s[:, 0]))
    np.testing.assert_array_equal(np.asarray(slim.L), np.asarray(full.L))
    np.testing.assert_array_equal(np.asarray(slim.dl), np.asarray(full.dl))
    np.testing.assert_array_equal(np.asarray(slim.m_fail),
                                  np.asarray(full.m_fail))
    np.testing.assert_array_equal(np.asarray(slim.h_fail),
                                  np.asarray(full.h_fail))


def test_kernel_slim_matches_full_evaluating(bank_inputs):
    # Evaluating slim without a dl stream ≡ full with streamed zeros.
    ap_b, thetas, mus = bank_inputs
    full_opt = riccati_bank(ap_b, thetas, mus)
    L_fix = full_opt.L
    full = riccati_bank(ap_b, thetas, mus, L_fix,
                        jnp.zeros_like(full_opt.dl))
    slim = riccati_bank(ap_b, thetas, mus, L_fix, slim=True)
    assert slim.L is None and slim.dl is None
    np.testing.assert_array_equal(np.asarray(slim.value),
                                  np.asarray(full.s[:, 0]))
    np.testing.assert_array_equal(np.asarray(slim.m_fail),
                                  np.asarray(full.m_fail))


def test_kernel_shared_noise_model_matches_batched(bank_inputs):
    # Lane-invariant W passed unbatched (SMEM path) ≡ per-lane broadcast.
    ap_b, thetas, mus = bank_inputs
    ap_shared = ap_b._replace(W=ap_b.W[0], W_inv=ap_b.W_inv[0],
                              logdet_W=ap_b.logdet_W[0])
    full = riccati_bank(ap_b, thetas, mus)
    shared = riccati_bank(ap_shared, thetas, mus)
    for name in ("s", "s_vec", "S", "g", "G", "H", "L", "dl"):
        np.testing.assert_allclose(
            np.asarray(getattr(shared, name)),
            np.asarray(getattr(full, name)), rtol=1e-6, atol=1e-7,
            err_msg=name)
    slim = riccati_bank(ap_shared, thetas, mus, slim=True)
    np.testing.assert_array_equal(np.asarray(slim.value),
                                  np.asarray(shared.s[:, 0]))


def test_kernel_neurotic_lane_flags(bank_inputs):
    ap_b, thetas, mus = bank_inputs
    thetas = thetas.at[2].set(1e6)  # lane 2 breaks down
    out = riccati_bank(ap_b, thetas, mus)
    assert bool(out.m_fail[2])
    assert not bool(out.m_fail[0]) and not bool(out.m_fail[1])


def test_custom_vmap_dispatch_full_solve():
    # Force the Pallas path (interpret mode on CPU) through the complete
    # jitted solver bank and compare against the scan path.
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.ops import riccati
    from ratilqr_tpu.solvers import ileqg as ileqg_mod

    dt = jnp.float32
    prob = unicycle(N=8, dtype=dt)
    x0 = jnp.zeros(3, dt)
    u0 = jnp.zeros((8, 2), dt)
    th = jnp.array([0.0, 0.005, 0.01, 0.02], dt)

    def run_bank(cfg):
        bank = ileqg_mod.make_batched_solver(prob, cfg)
        return np.asarray(bank(x0, u0, th).value)

    old_force = os.environ.get("RATILQR_FORCE_PALLAS")
    try:
        os.environ["RATILQR_FORCE_PALLAS"] = "1"
        riccati._make_core.cache_clear()
        ileqg_mod.make_batched_solver.cache_clear()
        v_pallas = run_bank(ILEQGConfig(iter_max=5))
    finally:
        if old_force is None:
            os.environ.pop("RATILQR_FORCE_PALLAS", None)
        else:
            os.environ["RATILQR_FORCE_PALLAS"] = old_force
        riccati._make_core.cache_clear()
        ileqg_mod.make_batched_solver.cache_clear()

    v_scan = run_bank(ILEQGConfig(iter_max=5, ls_max_trials=63))
    np.testing.assert_allclose(v_pallas, v_scan, rtol=2e-4)


# --- closed-loop folded evaluating mode ----------------------------------

@pytest.fixture
def folded_inputs():
    from ratilqr_tpu.ops.approx import approximate_folded

    dt = jnp.float32
    prob = unicycle(N=T, dtype=dt)
    x_ref = 0.1 * jax.random.normal(jax.random.key(2), (B, T + 1, 3), dt)
    ls = 0.1 * jax.random.normal(jax.random.key(3), (B, T, 2), dt)
    Ls = 0.2 * jax.random.normal(jax.random.key(4), (B, T, 2, 3), dt)
    mus = jnp.array([0.0, 0.0, 1e-3, 0.0, 0.4], dt)
    thetas = jnp.array([0.0, 0.01, 0.05, 0.1, 0.02], dt)
    fa = jax.vmap(lambda xr, l, L, mu: approximate_folded(prob, xr, l, L,
                                                          mu))(
        x_ref, ls, Ls, mus)
    return prob, fa, (x_ref, ls, Ls, mus), thetas


def test_folded_kernel_matches_folded_scan(folded_inputs):
    """The folded Pallas kernel (interpret) ≡ the folded scan core."""
    from ratilqr_tpu.ops.riccati import _riccati_folded_core
    from ratilqr_tpu.ops.riccati_pallas import riccati_bank_folded

    _, fa, _, thetas = folded_inputs
    bank = riccati_bank_folded(fa, thetas)
    vals, fails = jax.vmap(_riccati_folded_core)(fa, thetas)
    np.testing.assert_array_equal(np.asarray(bank.m_fail),
                                  np.asarray(fails))
    ok = ~np.asarray(fails)
    np.testing.assert_allclose(np.asarray(bank.value)[ok],
                               np.asarray(vals)[ok], rtol=1e-5)


def test_folded_equals_unfolded_evaluation(folded_inputs):
    """Fold identity: dp_evaluate_folded == dp_evaluate(approx, L, None)
    with the same (x_ref, l, L, mu) — the closed-loop substitution
    (FoldedApprox docstring) is exact up to reassociation."""
    from ratilqr_tpu.ops.approx import approximate_model
    from ratilqr_tpu.ops.riccati import (_riccati_core,
                                         _riccati_folded_core)
    from ratilqr_tpu.ops.rollout import rollout_feedback_with_jac

    prob, fa, (x_ref, ls, Ls, mus), thetas = folded_inputs

    def unfolded(xr, l, L, mu, th):
        x, u, A, Bm = rollout_feedback_with_jac(prob, xr, l, L)
        ap = approximate_model(prob, u, x, A, Bm)
        dl0 = jnp.zeros_like(l)
        dp, _, _, m_fail, _ = _riccati_core(ap, th, mu, L, dl0)
        return dp.s[0], m_fail

    v_ref, f_ref = jax.vmap(unfolded)(x_ref, ls, Ls, mus, thetas)
    v_fold, f_fold = jax.vmap(_riccati_folded_core)(fa, thetas)
    np.testing.assert_array_equal(np.asarray(f_fold), np.asarray(f_ref))
    ok = ~np.asarray(f_ref)
    np.testing.assert_allclose(np.asarray(v_fold)[ok],
                               np.asarray(v_ref)[ok], rtol=5e-5)


def test_folded_shared_noise_model_matches_batched(folded_inputs):
    """SMEM shared-W folded kernel ≡ per-lane-W folded kernel."""
    from ratilqr_tpu.ops.riccati_pallas import riccati_bank_folded

    _, fa, _, thetas = folded_inputs
    batched = riccati_bank_folded(fa, thetas)
    fa_shared = fa._replace(W=fa.W[0], W_inv=fa.W_inv[0],
                            logdet_W=fa.logdet_W[0])
    shared = riccati_bank_folded(fa_shared, thetas)
    np.testing.assert_array_equal(np.asarray(shared.m_fail),
                                  np.asarray(batched.m_fail))
    np.testing.assert_allclose(np.asarray(shared.value),
                               np.asarray(batched.value), rtol=1e-6)


def test_fold_candidate_eval_solver_equivalence():
    """fold_candidate_eval=True must reproduce the default solver's
    results (same trajectories/values within reassociation tolerance,
    same iteration/trial counts) — the fold is a pure data-layout
    transform of the candidate evaluation."""
    import dataclasses

    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.solvers.ileqg import make_batched_solver

    dt = jnp.float64
    prob = unicycle(N=12, dtype=dt)
    x0 = jnp.array([0.3, -0.2, 0.1], dt)
    u0 = 0.05 * jnp.ones((12, 2), dt)
    th = jnp.array([0.0, 0.01, 0.05, 1e6], dt)
    base = ILEQGConfig(iter_max=20, adaptive_eps_init=True,
                       eps_history_cap=0)
    r0 = make_batched_solver(prob, base)(x0, u0, th)
    r1 = make_batched_solver(
        prob, dataclasses.replace(base, fold_candidate_eval=True))(
        x0, u0, th)
    np.testing.assert_array_equal(np.asarray(r1.failed),
                                  np.asarray(r0.failed))
    np.testing.assert_array_equal(np.asarray(r1.iterations),
                                  np.asarray(r0.iterations))
    np.testing.assert_array_equal(np.asarray(r1.eps_count),
                                  np.asarray(r0.eps_count))
    ok = ~np.asarray(r0.failed)
    np.testing.assert_allclose(np.asarray(r1.value)[ok],
                               np.asarray(r0.value)[ok], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r1.l)[ok], np.asarray(r0.l)[ok],
                               atol=1e-10)
