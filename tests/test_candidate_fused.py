"""Fused line-search-candidate kernel tests (interpret mode on CPU).

Pins the three layers of ``ops/candidate_pallas.py``:
  1. tile models equal the AD derivatives of the problem callbacks,
  2. the fused kernel equals the XLA folded composition
     (``approximate_folded`` + ``dp_evaluate_folded``) lane-for-lane,
  3. the solver flag (``ILEQGConfig.fused_candidate_eval``) preserves the
     full solve's results.
On TPU the same kernel compiles via Mosaic; on-device equivalence is
exercised by benchmarks/verify_candidate_tpu.py (committed artifact).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ratilqr_tpu.models import cartpole, lqr_problem, quadrotor, unicycle
from ratilqr_tpu.ops import smallmat
from ratilqr_tpu.ops.approx import approximate_folded, approximate_model
from ratilqr_tpu.ops.candidate_pallas import candidate_bank
from ratilqr_tpu.ops.riccati import dp_evaluate_folded

T, B = 7, 5


def _bank_inputs(prob, n, m, seed=0):
    dt = jnp.float32
    x0s = 0.1 * jax.random.normal(jax.random.key(seed), (B, n), dt)
    ls = 0.1 * jax.random.normal(jax.random.key(seed + 1), (B, T, m), dt)
    Ls = 0.1 * jax.random.normal(jax.random.key(seed + 2), (B, T, m, n),
                                 dt)
    # Nominal trajectories: open-loop rollouts of a DIFFERENT schedule so
    # the closed-loop feedback term is genuinely exercised.
    from ratilqr_tpu.ops.rollout import rollout_open_loop
    x_refs = jax.vmap(lambda x0, l: rollout_open_loop(prob, x0, 0.5 * l))(
        x0s, ls)
    # θ mix: risk-neutral, moderate, and one absurd lane that must fail
    # (neurotic breakdown → m_fail parity).
    thetas = jnp.array([0.0, 0.01, 0.05, 1e6, 0.02], dt)
    mus = jnp.array([0.0, 0.0, 1e-3, 0.0, 1e-2], dt)
    return x_refs, ls, Ls, mus, thetas


def _xla_reference(prob, x_refs, ls, Ls, mus, thetas):
    def one(x_ref, l, L, mu, th):
        folded = approximate_folded(prob, x_ref, l, L, mu)
        return dp_evaluate_folded(folded, theta=th)
    return jax.vmap(one)(x_refs, ls, Ls, mus, thetas)


def _shared_w(prob, dtype):
    ks = jnp.arange(T)
    Wm = jax.vmap(prob.W)(ks).astype(dtype)
    chol = smallmat.cholesky(Wm)
    return Wm, smallmat.cho_inverse(chol), smallmat.cho_logdet(chol)


@pytest.mark.parametrize("recompute", [False, True])
@pytest.mark.parametrize("maker,n,m", [(unicycle, 3, 2),
                                       (lqr_problem, 2, 2),
                                       (cartpole, 4, 1),
                                       (quadrotor, 12, 4)])
def test_candidate_kernel_matches_folded_xla(maker, n, m, recompute):
    """Both kernel variants: the stored-folded-stack default and the
    round-5 RECOMPUTE variant (trajectory-only VMEM residency, folded
    blocks re-derived per backward step — the dispatch for models/
    horizons whose folded stack busts VMEM)."""
    prob = maker(N=T, dtype=jnp.float32)
    x_refs, ls, Ls, mus, thetas = _bank_inputs(prob, n, m)
    v_ref, f_ref = _xla_reference(prob, x_refs, ls, Ls, mus, thetas)
    W, W_inv, logdet_W = _shared_w(prob, jnp.float32)
    out = candidate_bank(prob.tile_model, x_refs, ls, Ls, mus, thetas,
                         W, W_inv, logdet_W, recompute=recompute)
    np.testing.assert_array_equal(np.asarray(out.m_fail),
                                  np.asarray(f_ref))
    ok = ~np.asarray(f_ref)
    assert ok.sum() >= 3, "fixture lost its feasible lanes"
    np.testing.assert_allclose(np.asarray(out.value)[ok],
                               np.asarray(v_ref)[ok], rtol=3e-5)


@pytest.mark.parametrize("maker,n,m", [(unicycle, 3, 2),
                                       (lqr_problem, 2, 2),
                                       (cartpole, 4, 1),
                                       (quadrotor, 12, 4)])
def test_tile_model_derivatives_match_ad(maker, n, m):
    """The tile model's closed-form pieces equal AD of the problem
    callbacks at random points (drift guard for models/examples.py —
    this is what makes hand-derived Jacobians like the cartpole's safe)."""
    prob = maker(N=T, dtype=jnp.float32)
    tm = prob.tile_model
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        u = jnp.asarray(rng.standard_normal(m), jnp.float32)
        # Tile versions: broadcast each component over one (8, 128) tile.
        xt = jnp.broadcast_to(x[:, None, None], (n, 8, 128))
        ut = jnp.broadcast_to(u[:, None, None], (m, 8, 128))

        xn_t, A_t, B_t = tm.f_jac_tile(xt, ut)
        xn = prob.f(x, u)
        A = jax.jacfwd(prob.f, argnums=0)(x, u)
        Bm = jax.jacfwd(prob.f, argnums=1)(x, u)
        np.testing.assert_allclose(np.asarray(xn_t[:, 0, 0]), xn,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(A_t[:, :, 0, 0]), A,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(B_t[:, :, 0, 0]), Bm,
                                   rtol=1e-6)

        k = jnp.asarray(3)
        q_t, qv_t, Q_t, r_t, R_t, P_t = tm.quad_tile(k, xt, ut)
        q = prob.c(k, x, u)
        qv = jax.grad(prob.c, argnums=1)(k, x, u)
        Q = jax.hessian(prob.c, argnums=1)(k, x, u)
        r = jax.grad(prob.c, argnums=2)(k, x, u)
        R = jax.hessian(prob.c, argnums=2)(k, x, u)
        P = jax.jacfwd(jax.grad(prob.c, argnums=2), argnums=1)(k, x, u)
        np.testing.assert_allclose(float(q_t[0, 0]), float(q), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(qv_t[:, 0, 0]), qv,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(Q_t[:, :, 0, 0]), Q,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(r_t[:, 0, 0]), r, rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(R_t[:, :, 0, 0]), R,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(P_t[:, :, 0, 0]), P,
                                   rtol=1e-5, atol=1e-7)

        qT_t, qvT_t, QT_t = tm.term_tile(xt)
        np.testing.assert_allclose(float(qT_t[0, 0]), float(prob.h(x)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(qvT_t[:, 0, 0]),
                                   jax.grad(prob.h)(x), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(QT_t[:, :, 0, 0]),
                                   jax.hessian(prob.h)(x), rtol=1e-5)


def test_fused_flag_full_solve_matches(monkeypatch):
    """Bank solve with fused_candidate_eval=True (kernel forced on CPU
    interpret) equals the default path's values within the candidate
    tolerance class."""
    monkeypatch.setenv("RATILQR_FORCE_PALLAS", "1")
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.ops import candidate_pallas, riccati
    from ratilqr_tpu.solvers import ileqg as ileqg_mod

    riccati._make_core.cache_clear()
    candidate_pallas._make_candidate_core.cache_clear()
    ileqg_mod.make_batched_solver.cache_clear()
    try:
        dt = jnp.float32
        prob = unicycle(N=10, dtype=dt)
        thetas = jnp.array([0.0, 0.005, 0.01, 0.02], dt)
        x0 = jnp.zeros(3, dt)
        u0 = jnp.zeros((10, 2), dt)
        cfg = ILEQGConfig(iter_max=6)
        bank_ref = ileqg_mod.make_batched_solver(prob, cfg)
        res_ref = bank_ref(x0, u0, thetas)
        bank_fused = ileqg_mod.make_batched_solver(
            prob, ILEQGConfig(iter_max=6, fused_candidate_eval=True))
        res_fused = bank_fused(x0, u0, thetas)
        np.testing.assert_array_equal(np.asarray(res_fused.failed),
                                      np.asarray(res_ref.failed))
        np.testing.assert_allclose(np.asarray(res_fused.value),
                                   np.asarray(res_ref.value), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res_fused.l),
                                   np.asarray(res_ref.l), rtol=1e-3,
                                   atol=1e-5)
    finally:
        riccati._make_core.cache_clear()
        candidate_pallas._make_candidate_core.cache_clear()
        ileqg_mod.make_batched_solver.cache_clear()
