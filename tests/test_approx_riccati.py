"""Approximation + Riccati DP tests mirroring ``test/ileqg_test.jl:52-148``."""
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import (approximate_model, decrease_mu_delta, dp_evaluate,
                         dp_optimize, increase_mu_delta, rollout_open_loop)
from ratilqr_tpu.problems import RiskSensitiveProblem

N = 10


@pytest.fixture
def traj():
    prob = RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * x @ x + 1.0 * u @ u + x @ u,
        h=lambda x: 0.5 * x @ x,
        W=lambda k: jnp.eye(2, dtype=jnp.float64),
        N=N)
    u = jnp.ones((N, 2), jnp.float64)
    x = rollout_open_loop(prob, jnp.zeros(2, jnp.float64), u)
    return prob, x, u


def test_approximate_model_closed_form(traj):
    # Closed-form derivative checks (test/ileqg_test.jl:57-66).
    prob, x, u = traj
    ap = approximate_model(prob, u, x)
    xs = np.asarray(x)
    for k in range(N):
        np.testing.assert_allclose(
            float(ap.q[k]), 0.5 * xs[k] @ xs[k] + 2.0 + xs[k] @ np.ones(2))
        np.testing.assert_allclose(np.asarray(ap.q_vec[k]), xs[k] + 1.0)
        np.testing.assert_allclose(np.asarray(ap.Q[k]), np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.r[k]), xs[k] + 2.0)
        np.testing.assert_allclose(np.asarray(ap.R[k]), 2.0 * np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.P[k]), np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.A[k]), np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.B[k]), np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.W[k]), np.eye(2))
        np.testing.assert_allclose(np.asarray(ap.W_inv[k]), np.eye(2),
                                   atol=1e-12)
        np.testing.assert_allclose(float(ap.logdet_W[k]), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(ap.q_term), 0.5 * xs[-1] @ xs[-1])
    np.testing.assert_allclose(np.asarray(ap.q_vec_term), xs[-1])
    np.testing.assert_allclose(np.asarray(ap.Q_term), np.eye(2))


@pytest.fixture
def lqr():
    prob = RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * x @ x + 1.0 * u @ u,
        h=lambda x: 0.5 * x @ x,
        W=lambda k: jnp.eye(2, dtype=jnp.float64),
        N=N)
    u = jnp.ones((N, 2), jnp.float64)
    x = rollout_open_loop(prob, jnp.zeros(2, jnp.float64), u)
    return prob, x, u, approximate_model(prob, u, x)


def test_dp_optimize_gains_match_textbook_lqr(lqr):
    # Gold test: iLQG gains == independently computed LQR Riccati solution
    # (test/ileqg_test.jl:87-106).
    prob, x, u, ap = lqr
    dp, L, dl, mu, delta, failed = dp_optimize(
        ap, theta=0.0, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert not bool(failed)
    assert dp.s.shape == (N + 1,)
    assert dp.S.shape == (N + 1, 2, 2)
    S_np = np.asarray(dp.S)
    for t in range(N + 1):
        np.testing.assert_allclose(S_np[t], S_np[t].T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(S_np[t]) > 0)

    A = np.asarray(ap.A); B = np.asarray(ap.B)
    Q = np.asarray(ap.Q); R = np.asarray(ap.R)
    S_lqr = np.asarray(ap.Q_term)
    L_lqr = np.zeros((N, 2, 2))
    for t in reversed(range(N)):
        K = np.linalg.solve(R[t] + B[t].T @ S_lqr @ B[t],
                            B[t].T @ S_lqr @ A[t])
        L_lqr[t] = -K
        S_lqr = Q[t] + A[t].T @ S_lqr @ A[t] - (
            A[t].T @ S_lqr @ B[t]) @ K
    np.testing.assert_allclose(np.asarray(L), L_lqr, rtol=1e-8, atol=1e-10)

    # LQR is linear feedback: u + dl − L x ≈ 0 (test/ileqg_test.jl:108).
    resid = np.asarray(u) + np.asarray(dl) - np.einsum(
        'tij,tj->ti', np.asarray(L), np.asarray(x[:-1]))
    np.testing.assert_allclose(resid, 0.0, atol=1e-8)


def test_theta_continuity_at_zero(lqr):
    # θ=1e-8 DP ≈ θ=0 DP (test/ileqg_test.jl:110-125).
    prob, x, u, ap = lqr
    dp0, dl0 = [None] * 2
    dp0, L0, dl0, *_ , f0 = dp_optimize(
        ap, theta=0.0, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    dp1, L1, dl1, *_, f1 = dp_optimize(
        ap, theta=1e-8, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert not bool(f0) and not bool(f1)
    np.testing.assert_allclose(float(dp0.value), float(dp1.value), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dl0), np.asarray(dl1), rtol=1e-5,
                               atol=1e-8)


def test_optimizing_vs_evaluating_agreement(lqr):
    # Evaluating DP at the optimizing DP's (L, dl) reproduces the value
    # (test/ileqg_test.jl:127-130).
    prob, x, u, ap = lqr
    dp, L, dl, *_ , failed = dp_optimize(
        ap, theta=0.0, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    dp_eval, fail_eval = dp_evaluate(ap, L, dl, theta=0.0, mu=0.0)
    assert not bool(fail_eval)
    np.testing.assert_allclose(np.asarray(dp_eval.s), np.asarray(dp.s),
                               rtol=1e-12)


def test_risk_sensitive_value_exceeds_neutral(lqr):
    # Entropic risk is monotone in θ: value(θ>0) ≥ value(0).
    prob, x, u, ap = lqr
    vals = []
    for th in [0.0, 0.05, 0.2]:
        dp, *_, failed = dp_optimize(
            ap, theta=th, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
        assert not bool(failed)
        vals.append(float(dp.value))
    assert vals[0] < vals[1] < vals[2]


def test_neurotic_breakdown_flags(lqr):
    # Huge θ makes M = W⁻¹ − θS indefinite → failed flag (not an exception),
    # replacing the assert at ileqg.jl:366.
    prob, x, u, ap = lqr
    dp, L, dl, mu, delta, failed = dp_optimize(
        ap, theta=1e6, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert bool(failed)
    _, fail_eval = dp_evaluate(ap, jnp.zeros((N, 2, 2)), None, theta=1e6,
                               mu=0.0)
    assert bool(fail_eval)


def test_mu_delta_schedule():
    # μ/Δ schedule arithmetic (test/ileqg_test.jl:137-148).
    mu, delta = increase_mu_delta(jnp.array(0.0), jnp.array(2.0), 1e-6, 2.0)
    assert float(delta) == 4.0 and float(mu) == 1e-6
    mu, delta = decrease_mu_delta(jnp.array(0.0), jnp.array(2.0), 1e-6, 2.0)
    assert float(delta) == 0.5 and float(mu) == 0.0
    # increase from an active μ multiplies by the updated Δ.
    mu, delta = increase_mu_delta(jnp.array(1e-6), jnp.array(4.0), 1e-6, 2.0)
    assert float(delta) == 8.0 and float(mu) == 8e-6


def test_mu_restart_regularizes_indefinite_hessian():
    # A concave-in-u stage cost gives a non-PSD H at μ=0; the bounded
    # while_loop restart (ileqg.jl:358-401) must bump μ until H ≻ 0.
    prob = RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * x @ x - 0.55 * u @ u,
        h=lambda x: 0.05 * x @ x,
        W=lambda k: jnp.eye(2, dtype=jnp.float64),
        N=5)
    u = jnp.zeros((5, 2), jnp.float64)
    x = rollout_open_loop(prob, jnp.ones(2, jnp.float64), u)
    ap = approximate_model(prob, u, x)
    dp, L, dl, mu, delta, failed = dp_optimize(
        ap, theta=0.0, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert not bool(failed)
    assert float(mu) > 1e-6  # ratcheted up
    H = np.asarray(dp.H)
    for t in range(5):
        assert np.all(np.linalg.eigvalsh(H[t]) > 0)


def test_scan_unroll_bit_identical(lqr):
    # scan_unroll is a pure scheduling knob: results must match unroll=1.
    prob, x, u, ap = lqr
    a = dp_optimize(ap, theta=0.1, mu=0.0, delta=2.0, mu_min=1e-6,
                    delta_0=2.0, unroll=1)
    b = dp_optimize(ap, theta=0.1, mu=0.0, delta=2.0, mu_min=1e-6,
                    delta_0=2.0, unroll=5)
    np.testing.assert_allclose(np.asarray(a[0].s), np.asarray(b[0].s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-12)


def test_chol_ok_rejects_singular_last_pivot():
    # ADVICE r1: an exactly-singular PSD matrix whose zero pivot lands in
    # the LAST diagonal entry yields a finite Cholesky factor (no later
    # column for the NaN to poison); isposdef-parity requires rejecting it.
    from ratilqr_tpu.ops import smallmat

    M = jnp.asarray([[1.0, 1.0], [1.0, 1.0]], jnp.float64)  # rank 1
    L = smallmat.cholesky(M)
    assert bool(jnp.all(jnp.isfinite(L)))  # the trap: factor IS finite
    assert not bool(smallmat.chol_ok(L))
    # and a genuinely SPD matrix still passes
    M_ok = jnp.asarray([[2.0, 1.0], [1.0, 2.0]], jnp.float64)
    assert bool(smallmat.chol_ok(smallmat.cholesky(M_ok)))
