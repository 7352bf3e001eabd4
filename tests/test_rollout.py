"""Rollout & cost-kernel tests mirroring ``test/ileqg_test.jl:20-33``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import integrate_cost, rollout_feedback, rollout_open_loop
from ratilqr_tpu.models import double_integrator, gmm_integrator
from ratilqr_tpu.ops import (rollout_feedback_noisy, rollout_generative,
                             rollout_open_loop_noisy,
                             rollout_open_loop_with_jac)


@pytest.fixture
def prob():
    # f(x,u)=x+u, c(k,x,u)=k, h=1, W=I, N=10 (test/ileqg_test.jl:12-16).
    from ratilqr_tpu.problems import RiskSensitiveProblem
    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: jnp.asarray(k, jnp.float64),
        h=lambda x: jnp.asarray(1.0, jnp.float64),
        W=lambda k: jnp.eye(2, dtype=jnp.float64),
        N=10)


def test_open_loop_matches_hand_unrolled(prob):
    u = jnp.ones((prob.N, 2))
    x = rollout_open_loop(prob, jnp.zeros(2), u)
    assert x.shape == (prob.N + 1, 2)
    np.testing.assert_array_equal(x[0], np.zeros(2))
    for t in range(prob.N):
        np.testing.assert_allclose(x[t + 1], np.asarray(prob.f(x[t], u[t])))


def test_feedback_rollout_on_consistent_trajectory(prob):
    # On the reference trajectory itself the feedback terms vanish
    # (test/ileqg_test.jl:26-29).
    u = jnp.ones((prob.N, 2))
    x = rollout_open_loop(prob, jnp.zeros(2), u)
    L = jnp.ones((prob.N, 2, 2))
    x_new, u_new = rollout_feedback(prob, x, u, L)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x))
    np.testing.assert_allclose(np.asarray(u_new), np.asarray(u))


def test_integrate_cost_matches_explicit_sum(prob):
    u = jnp.ones((prob.N, 2))
    x = rollout_open_loop(prob, jnp.zeros(2), u)
    cost = integrate_cost(prob, x, u)
    expected = sum(float(prob.c(k, x[k], u[k])) for k in range(prob.N))
    expected += float(prob.h(x[-1]))
    np.testing.assert_allclose(float(cost), expected)


def test_open_loop_with_jac_matches_autodiff():
    prob = double_integrator(N=5)
    u = 0.3 * jnp.ones((5, 2))
    x_plain = rollout_open_loop(prob, jnp.zeros(2), u)
    x, A, B = rollout_open_loop_with_jac(prob, jnp.zeros(2), u)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_plain))
    np.testing.assert_allclose(np.asarray(A), np.eye(2)[None].repeat(5, 0))
    np.testing.assert_allclose(np.asarray(B), np.eye(2)[None].repeat(5, 0))


def test_noisy_rollouts_deterministic_given_key(prob):
    u = jnp.ones((prob.N, 2))
    key = jax.random.key(0)
    x1 = rollout_open_loop_noisy(prob, jnp.zeros(2), u, key)
    x2 = rollout_open_loop_noisy(prob, jnp.zeros(2), u, key)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    x3 = rollout_open_loop_noisy(prob, jnp.zeros(2), u, jax.random.key(1))
    assert not np.allclose(np.asarray(x1), np.asarray(x3))

    x_ref = rollout_open_loop(prob, jnp.zeros(2), u)
    L = jnp.zeros((prob.N, 2, 2))
    xf, uf = rollout_feedback_noisy(prob, x_ref, u, L, key)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(u))
    # Zero gains + same key: noise sequence identical to the open-loop case.
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x1))


def test_generative_rollout_cost():
    prob = gmm_integrator(N=10)
    u = jnp.zeros((10, 2))
    key = jax.random.key(7)
    x, cost = rollout_generative(prob, jnp.ones(2), u, key)
    assert x.shape == (11, 2)
    # Cost must equal re-integration over the generated trajectory.
    expected = sum(float(prob.c(k, x[k], u[k])) for k in range(10))
    expected += float(prob.h(x[-1]))
    np.testing.assert_allclose(float(cost), expected, rtol=1e-12)
    # true-model variant runs and differs statistically
    x_t, _ = rollout_generative(prob, jnp.ones(2), u, key,
                                use_true_model=True)
    assert x_t.shape == (11, 2)


def test_rollouts_vmap():
    prob = double_integrator(N=6)
    u_bank = jnp.stack([0.1 * jnp.ones((6, 2)), 0.2 * jnp.ones((6, 2))])
    xs = jax.vmap(lambda u: rollout_open_loop(prob, jnp.zeros(2), u))(u_bank)
    assert xs.shape == (2, 7, 2)
    np.testing.assert_allclose(np.asarray(xs[1, -1]), 1.2 * np.ones(2))
