"""Parallel-in-time Riccati: exact equivalence with the sequential scans."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu.models import cartpole, lqr_problem, unicycle
from ratilqr_tpu.ops.approx import approximate_model
from ratilqr_tpu.ops.riccati import dp_evaluate, dp_optimize
from ratilqr_tpu.ops.riccati_parallel import (Element, combine,
                                              dp_evaluate_parallel,
                                              dp_optimize_parallel)
from ratilqr_tpu.ops.rollout import rollout_open_loop_with_jac
from ratilqr_tpu.problems import RiskSensitiveProblem


def _rand_element(key, n):
    ks = jax.random.split(key, 5)
    A = 0.3 * jax.random.normal(ks[0], (n, n))
    b = jax.random.normal(ks[1], (n,))
    Cm = 0.3 * jax.random.normal(ks[2], (n, n))
    C = Cm @ Cm.T * 0.1
    eta = jax.random.normal(ks[3], (n,))
    Jm = 0.3 * jax.random.normal(ks[4], (n, n))
    J = Jm @ Jm.T
    return Element(A=A, b=b, C=C, eta=eta, J=J)


def _terminal(S, v):
    n = S.shape[-1]
    return Element(A=jnp.zeros((n, n)), b=jnp.zeros(n),
                   C=jnp.zeros((n, n)), eta=v, J=S)


def _apply(e, S, v):
    out = combine(e, _terminal(S, v))
    return out.J, out.eta


def test_combine_is_associative_and_consistent():
    n = 3
    e1 = _rand_element(jax.random.key(0), n)
    e2 = _rand_element(jax.random.key(1), n)
    e3 = _rand_element(jax.random.key(2), n)
    S = jnp.eye(n) * 0.7
    v = jnp.ones(n)

    # function composition: apply(e1∘e2) == apply(e1) ∘ apply(e2)
    S12, v12 = _apply(combine(e1, e2), S, v)
    S2, v2 = _apply(e2, S, v)
    S12b, v12b = _apply(e1, S2, v2)
    np.testing.assert_allclose(np.asarray(S12), np.asarray(S12b),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v12), np.asarray(v12b),
                               rtol=1e-10)

    # associativity
    a = combine(combine(e1, e2), e3)
    b = combine(e1, combine(e2, e3))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-9, atol=1e-11)


def _fixture_with_cross_terms(N=12):
    # cost with x-u cross terms exercises the complete-the-square path
    return RiskSensitiveProblem(
        f=lambda x, u: x + 0.1 * u + 0.05 * jnp.sin(x),
        c=lambda k, x, u: (0.5 * x @ x + u @ u + 0.3 * (x @ u)
                           + 0.1 * jnp.sum(u) + 0.05 * jnp.sum(x)),
        h=lambda x: 0.5 * x @ x,
        W=lambda k: 0.05 * jnp.eye(2, dtype=jnp.float64),
        N=N)


CASES = [
    ("lqr_theta0", lambda: lqr_problem(N=10), 2, 0.0, 0.0),
    ("lqr_risk", lambda: lqr_problem(N=10, noise=0.01), 2, 0.3, 0.0),
    ("cross_terms", _fixture_with_cross_terms, 2, 0.1, 0.0),
    ("cross_terms_mu", _fixture_with_cross_terms, 2, 0.05, 1e-3),
    ("unicycle", lambda: unicycle(N=20), 2, 0.02, 0.0),
    ("cartpole", lambda: cartpole(N=15), 1, 0.001, 0.0),
]


@pytest.mark.parametrize("name,mk,m,theta,mu", CASES,
                         ids=[c[0] for c in CASES])
def test_parallel_matches_sequential(name, mk, m, theta, mu):
    prob = mk()
    n = len(np.asarray(prob.W(0)))
    u = 0.1 * jnp.ones((prob.N, m), jnp.float64)
    x0 = 0.3 * jnp.ones(n, jnp.float64)
    x, A, B = rollout_open_loop_with_jac(prob, x0, u)
    ap = approximate_model(prob, u, x, A, B)

    # optimizing pass
    dp_s, L_s, dl_s, mu_s, _, fail_s = dp_optimize(
        ap, theta=theta, mu=mu, delta=2.0, mu_min=1e-6, delta_0=2.0)
    dp_p, L_p, dl_p, mu_p, _, fail_p = dp_optimize_parallel(
        ap, theta=theta, mu=mu, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert bool(fail_s) == bool(fail_p)
    if not bool(fail_s):
        np.testing.assert_allclose(np.asarray(dp_p.S), np.asarray(dp_s.S),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(dp_p.s_vec),
                                   np.asarray(dp_s.s_vec), rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(dp_p.s), np.asarray(dp_s.s),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_s),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_s),
                                   rtol=1e-8, atol=1e-10)

    # evaluating pass at the optimized policy
    dp_es, fail_es = dp_evaluate(ap, L_s, dl_s, theta=theta, mu=mu)
    dp_ep, fail_ep = dp_evaluate_parallel(ap, L_s, dl_s, theta=theta,
                                          mu=mu)
    assert bool(fail_es) == bool(fail_ep)
    np.testing.assert_allclose(np.asarray(dp_ep.s), np.asarray(dp_es.s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dp_ep.S), np.asarray(dp_es.S),
                               rtol=1e-8, atol=1e-10)


def test_parallel_detects_neurotic_breakdown():
    prob = lqr_problem(N=10)  # W = I → θ=0.5 infeasible
    u = jnp.ones((10, 2), jnp.float64)
    x, A, B = rollout_open_loop_with_jac(prob, jnp.zeros(2), u)
    ap = approximate_model(prob, u, x, A, B)
    *_, fail = dp_optimize_parallel(ap, theta=0.5, mu=0.0, delta=2.0,
                                    mu_min=1e-6, delta_0=2.0)
    assert bool(fail)


def test_parallel_handles_indefinite_R_with_psd_H():
    # Indefinite R (but H = R + B'S̃B PSD): the sequential path succeeds
    # without restarts; the parallel completed-square form must too (it
    # needs R̃ invertible, not PSD).
    prob = RiskSensitiveProblem(
        f=lambda x, u: x + 2.0 * u,
        c=lambda k, x, u: 0.5 * x @ x + 0.5 * u @ u - 0.6 * u[0] ** 2,
        h=lambda x: 5.0 * x @ x,
        W=lambda k: 0.05 * jnp.eye(2, dtype=jnp.float64),
        N=8)
    u = 0.1 * jnp.ones((8, 2), jnp.float64)
    x, A, B = rollout_open_loop_with_jac(prob, 0.3 * jnp.ones(2), u)
    ap = approximate_model(prob, u, x, A, B)
    dp_s, L_s, dl_s, mu_s, _, fail_s = dp_optimize(
        ap, theta=0.05, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    dp_p, L_p, dl_p, mu_p, _, fail_p = dp_optimize_parallel(
        ap, theta=0.05, mu=0.0, delta=2.0, mu_min=1e-6, delta_0=2.0)
    assert not bool(fail_s) and not bool(fail_p)
    np.testing.assert_allclose(np.asarray(dp_p.s), np.asarray(dp_s.s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_s),
                               rtol=1e-8, atol=1e-10)
