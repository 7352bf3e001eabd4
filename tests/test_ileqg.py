"""End-to-end iLEQG solver tests mirroring ``test/ileqg_test.jl:36-49,
133-134,150-174`` plus batched-bank equivalence (SURVEY.md §4 implication b).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import (ILEQGConfig, approximate_model, dp_evaluate,
                         ileqg_solve, make_batched_solver, rollout_open_loop)
from ratilqr_tpu.models import lqr_problem, nonlinear_toy
from ratilqr_tpu.solvers.ileqg import _initialize


def test_initialize_postconditions():
    # initialize! post-conditions (test/ileqg_test.jl:36-49): l = u, L = 0,
    # μ = 0, value = evaluating-DP value at zero gains.
    prob = lqr_problem(N=10)
    u = jnp.ones((10, 2), jnp.float64)
    x0 = jnp.zeros(2, jnp.float64)
    st = _initialize(prob, ILEQGConfig(), x0, u, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(st.l), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(st.L), 0.0)
    assert float(st.mu) == 0.0 and float(st.delta) == 2.0
    assert np.isinf(float(st.d_current))
    assert int(st.iterations) == 0 and int(st.eps_count) == 0

    # The slim carry does not thread the trajectory (it is re-derived from
    # (x0, l) each step); the initialize-time value must still equal the
    # evaluating-DP value along the nominal rollout.
    x = rollout_open_loop(prob, x0, u)
    ap = approximate_model(prob, u, x)
    dp, _ = dp_evaluate(ap, jnp.zeros((10, 2, 2)), None, theta=0.0, mu=0.0)
    np.testing.assert_allclose(float(st.value), float(dp.value), rtol=1e-12)


def test_lqr_converges_in_one_step():
    # For an LQR problem the first line-search trial at ε=1 lands exactly on
    # the optimum and the solver converges immediately
    # (test/ileqg_test.jl:133-134).
    prob = lqr_problem(N=10)
    u = jnp.ones((10, 2), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2, jnp.float64), u, 0.0)
    assert not bool(res.failed)
    # Optimal value equals the optimizing-DP value from the first iteration.
    from ratilqr_tpu import dp_optimize
    x = rollout_open_loop(prob, jnp.zeros(2, jnp.float64), u)
    ap = approximate_model(prob, u, x)
    dp, *_ = dp_optimize(ap, theta=0.0, mu=0.0, delta=2.0, mu_min=1e-6,
                         delta_0=2.0)
    np.testing.assert_allclose(float(res.value), float(dp.value), rtol=1e-8)
    # Converged quickly and with the full step accepted first try.
    assert int(res.iterations) <= 3
    hist = np.asarray(res.eps_history)[:int(res.eps_count)]
    assert hist[0, 0] == 1.0 and hist[0, 1] <= 0.0


def test_nonlinear_first_linesearch_improves():
    # Nonlinear fixture: first LS trial at ε=1 accepted with negative Δvalue
    # (test/ileqg_test.jl:150-170).
    prob = nonlinear_toy(N=10)
    u = 0.1 * jnp.ones((10, 2), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(iter_max=1), jnp.zeros(2), u, 0.5)
    assert not bool(res.failed)
    assert int(res.eps_count) >= 1
    hist = np.asarray(res.eps_history)
    assert hist[0, 0] == 1.0
    assert hist[0, 1] < 0.0


def test_nonlinear_regulates_to_origin():
    # End-to-end θ=0 solve drives the state to the origin
    # (test/ileqg_test.jl:172-174).
    prob = nonlinear_toy(N=10)
    u = 0.1 * jnp.ones((10, 2), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2, jnp.float64), u, 0.0)
    assert not bool(res.failed)
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-4)


def test_risk_sensitivity_monotone_end_to_end():
    # Small W keeps the zero-gain init feasible at θ>0 (W=I breaks down at
    # init exactly as the reference's initialize! DP assert would).
    prob = lqr_problem(N=10, noise=0.01)
    u = jnp.ones((10, 2), jnp.float64)
    v0 = float(ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2), u, 0.0).value)
    v1 = float(ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2), u, 0.3).value)
    assert v0 < v1


def test_neurotic_theta_gives_inf_value():
    # vmap-safe Inf-masking of neurotic breakdown
    # (replaces catch-to-Inf at cross_entropy_bilevel_optimization.jl:161-166).
    prob = lqr_problem(N=10)
    u = jnp.ones((10, 2), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2, jnp.float64), u, 1e6)
    assert bool(res.failed)
    assert np.isinf(float(res.value))


def test_batched_bank_matches_individual_solves():
    # The vmapped θ-bank (replacing process fan-out) must agree lane-by-lane
    # with individual solves — the analogue of the reference's
    # parallel ≡ serial test (test/cross_entropy_bilevel_optimization_test.jl:29-32).
    prob = lqr_problem(N=10, noise=0.01)
    cfg = ILEQGConfig()
    u = jnp.ones((10, 2), jnp.float64)
    x0 = jnp.zeros(2, jnp.float64)
    thetas = jnp.array([0.0, 0.1, 0.3, 1e6])  # incl. one neurotic lane
    bank = make_batched_solver(prob, cfg)
    out = bank(x0, u, thetas)
    for i, th in enumerate(np.asarray(thetas)):
        single = ileqg_solve(prob, cfg, x0, u, float(th))
        np.testing.assert_allclose(float(out.value[i]), float(single.value),
                                   rtol=1e-9)
        if not bool(single.failed):
            np.testing.assert_allclose(np.asarray(out.l[i]),
                                       np.asarray(single.l), rtol=1e-7,
                                       atol=1e-9)


def test_adaptive_eps_init_runs():
    prob = nonlinear_toy(N=10)
    u = 0.1 * jnp.ones((10, 2), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(adaptive_eps_init=True),
                      jnp.zeros(2, jnp.float64), u, 0.2)
    assert not bool(res.failed)
    assert np.isfinite(float(res.value))
