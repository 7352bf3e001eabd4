"""Fused step-optimize kernel tests (interpret mode on CPU).

Pins the three layers of ``ops/step_pallas.py``:
  1. the fused kernel (rollout + quadratize + optimizing DP in one Mosaic
     program) equals the XLA composition (``rollout_open_loop_with_jac`` +
     ``approximate_model`` + slim optimizing Riccati) lane-for-lane,
     including the first-failure latching order (m_fail vs h_fail),
  2. the μ-restart wrapper (``step_optimize``) equals the solver's default
     trio through a fixture that actually triggers H-PSD restarts,
  3. the solver flag (``ILEQGConfig.fused_step_optimize``) preserves the
     full solve's results.
On TPU the same kernel compiles via Mosaic; on-device equivalence and the
composed +18% A/B live in benchmarks/step_tpu_verification.json.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ratilqr_tpu.models import cartpole, lqr_problem, quadrotor, unicycle
from ratilqr_tpu.ops import smallmat
from ratilqr_tpu.ops.approx import approximate_model
from ratilqr_tpu.ops.riccati import _core_dispatch, dp_optimize
from ratilqr_tpu.ops.rollout import rollout_open_loop_with_jac
from ratilqr_tpu.ops.step_pallas import step_optimize, step_optimize_bank
from ratilqr_tpu.problems import RiskSensitiveProblem

T, B = 7, 5


def _bank_inputs(n, m, seed=0):
    dt = jnp.float32
    x0s = 0.1 * jax.random.normal(jax.random.key(seed), (B, n), dt)
    ls = 0.1 * jax.random.normal(jax.random.key(seed + 1), (B, T, m), dt)
    # θ mix: risk-neutral, moderate, and one absurd lane that must fail
    # (neurotic breakdown → m_fail parity).
    thetas = jnp.array([0.0, 0.01, 0.05, 1e6, 0.02], dt)
    mus = jnp.array([0.0, 0.0, 1e-3, 0.0, 1e-2], dt)
    return x0s, ls, mus, thetas


def _xla_reference(prob, x0s, ls, mus, thetas):
    def one(x0, l, th, mu):
        x, A, Bm = rollout_open_loop_with_jac(prob, x0, l)
        ap = approximate_model(prob, l, x, A, Bm)
        value, L, dl, m_fail, h_fail = _core_dispatch(
            ap, th, mu, None, None, 1, slim=True)
        return x, value, L, dl, m_fail, h_fail
    return jax.vmap(one)(x0s, ls, thetas, mus)


def _shared_w(prob, dtype):
    ks = jnp.arange(T)
    Wm = jax.vmap(prob.W)(ks).astype(dtype)
    chol = smallmat.cholesky(Wm)
    return Wm, smallmat.cho_inverse(chol), smallmat.cho_logdet(chol)


@pytest.mark.parametrize("maker,n,m", [(unicycle, 3, 2),
                                       (lqr_problem, 2, 2),
                                       (cartpole, 4, 1),
                                       (quadrotor, 12, 4)])
def test_step_kernel_matches_xla(maker, n, m):
    prob = maker(N=T, dtype=jnp.float32)
    x0s, ls, mus, thetas = _bank_inputs(n, m)
    x_r, v_r, L_r, dl_r, mf_r, hf_r = _xla_reference(prob, x0s, ls, mus,
                                                     thetas)
    W, W_inv, logdet_W = _shared_w(prob, jnp.float32)
    out = step_optimize_bank(prob.tile_model, x0s, ls, thetas, mus,
                             W, W_inv, logdet_W)
    np.testing.assert_array_equal(np.asarray(out.m_fail), np.asarray(mf_r))
    np.testing.assert_array_equal(np.asarray(out.h_fail), np.asarray(hf_r))
    # The nominal trajectory must match on every lane (it is μ/θ-free).
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(x_r),
                               rtol=1e-5, atol=1e-6)
    ok = ~np.asarray(mf_r | hf_r)
    assert ok.sum() >= 3, "fixture lost its feasible lanes"
    np.testing.assert_allclose(np.asarray(out.value)[ok],
                               np.asarray(v_r)[ok], rtol=3e-5)
    np.testing.assert_allclose(np.asarray(out.L)[ok], np.asarray(L_r)[ok],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dl)[ok],
                               np.asarray(dl_r)[ok], rtol=1e-4, atol=1e-5)


def _negative_R_problem(N=T):
    """n=2 fixture whose control cost has NEGATIVE curvature and a tiny
    terminal Hessian: at μ=0 the control Hessian H = R + BᵀDSB ≈
    −0.1 + 0.01 is indefinite at the horizon end (where S is still
    small), so dp_optimize must walk the μ-restart ladder — exactly the
    ``increase_μ_and_Δ!`` retry path (ileqg.jl:358-401)."""
    from ratilqr_tpu.ops.tile_model import TileModel, mat

    cu = -0.05
    ch = 0.005

    def f_jac_tile(x, u):
        one = jnp.ones_like(x[0])
        zero = jnp.zeros_like(x[0])
        x_next = jnp.stack([x[0] + u[0], x[1] + u[1]])
        A = mat([[one, zero], [zero, one]])
        B = mat([[one, zero], [zero, one]])
        return x_next, A, B

    def quad_tile(k, x, u):
        del k
        q = 0.5 * (x[0] * x[0] + x[1] * x[1]) + cu * (u[0] * u[0]
                                                      + u[1] * u[1])
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([x[0], x[1]])
        Q = mat([[one, zero], [zero, one]])
        r = 2.0 * cu * u
        R = mat([[2.0 * cu * one, zero], [zero, 2.0 * cu * one]])
        P = mat([[zero, zero], [zero, zero]])
        return q, q_vec, Q, r, R, P

    def term_tile(x):
        q = ch * (x[0] * x[0] + x[1] * x[1])
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([2.0 * ch * x[0], 2.0 * ch * x[1]])
        Q = mat([[2.0 * ch * one, zero], [zero, 2.0 * ch * one]])
        return q, q_vec, Q

    tm = TileModel(f_jac_tile=f_jac_tile, quad_tile=quad_tile,
                   term_tile=term_tile)
    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * (x @ x) + cu * (u @ u),
        h=lambda x: ch * (x @ x),
        W=lambda k: 0.01 * jnp.eye(2, dtype=jnp.float32),
        N=N, tile_model=tm)


def test_step_optimize_mu_restart_matches_trio():
    """``step_optimize`` (fused, restart loop outside the kernel) equals
    the solver's default composition on a fixture that REQUIRES μ-restarts
    (negative control curvature → non-PSD H at μ=0)."""
    prob = _negative_R_problem()
    dt = jnp.float32
    x0s = jnp.asarray([[1.0, -0.5], [0.3, 0.2], [2.0, 1.0]], dt)
    ls = 0.1 * jax.random.normal(jax.random.key(3), (3, T, 2), dt)
    # θ = 0 lanes: the negative-curvature fixture drives S through large
    # intermediate values, which a θ > 0 lane would turn into a neurotic
    # breakdown — restart coverage only needs the H-PSD path.
    thetas = jnp.array([0.0, 0.0, 0.0], dt)
    mu0 = jnp.zeros((3,), dt)
    delta0 = jnp.full((3,), 2.0, dt)

    def trio(x0, l, th, mu, de):
        x, A, Bm = rollout_open_loop_with_jac(prob, x0, l)
        ap = approximate_model(prob, l, x, A, Bm)
        value, L, dl, mu_o, de_o, failed = dp_optimize(
            ap, theta=th, mu=mu, delta=de, mu_min=1e-6, delta_0=2.0,
            slim=True)
        return x, value, L, dl, mu_o, de_o, failed

    x_r, v_r, L_r, dl_r, mu_r, de_r, f_r = jax.vmap(trio)(
        x0s, ls, thetas, mu0, delta0)

    def fused(x0, l, th, mu, de):
        return step_optimize(prob, x0, l, theta=th, mu=mu, delta=de,
                             mu_min=1e-6, delta_0=2.0)

    x_f, v_f, L_f, dl_f, mu_f, de_f, f_f = jax.vmap(fused)(
        x0s, ls, thetas, mu0, delta0)

    # The fixture must actually exercise the restart ladder.
    assert np.all(np.asarray(mu_r) > 0), "fixture stopped restarting"
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_r))
    assert not np.any(np.asarray(f_r)), "fixture lanes must recover"
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(de_f), np.asarray(de_r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(L_f), np.asarray(L_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl_f), np.asarray(dl_r),
                               rtol=1e-4, atol=1e-5)


def test_fused_step_flag_full_solve_matches(monkeypatch):
    """Bank solve with fused_step_optimize=True (kernel forced on CPU
    interpret) equals the default path's results."""
    monkeypatch.setenv("RATILQR_FORCE_PALLAS", "1")
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.ops import riccati, step_pallas
    from ratilqr_tpu.solvers import ileqg as ileqg_mod

    def clear():
        riccati._make_core.cache_clear()
        step_pallas._make_step_core.cache_clear()
        ileqg_mod.make_batched_solver.cache_clear()

    clear()
    try:
        dt = jnp.float32
        prob = unicycle(N=10, dtype=dt)
        thetas = jnp.array([0.0, 0.005, 0.01, 0.02], dt)
        x0 = jnp.zeros(3, dt)
        u0 = jnp.zeros((10, 2), dt)
        bank_ref = ileqg_mod.make_batched_solver(prob,
                                                 ILEQGConfig(iter_max=6))
        res_ref = bank_ref(x0, u0, thetas)
        bank_fused = ileqg_mod.make_batched_solver(
            prob, ILEQGConfig(iter_max=6, fused_step_optimize=True))
        res_fused = bank_fused(x0, u0, thetas)
        np.testing.assert_array_equal(np.asarray(res_fused.failed),
                                      np.asarray(res_ref.failed))
        np.testing.assert_array_equal(np.asarray(res_fused.iterations),
                                      np.asarray(res_ref.iterations))
        np.testing.assert_allclose(np.asarray(res_fused.value),
                                   np.asarray(res_ref.value), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res_fused.l),
                                   np.asarray(res_ref.l), rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(res_fused.L),
                                   np.asarray(res_ref.L), rtol=1e-3,
                                   atol=1e-4)
    finally:
        clear()
