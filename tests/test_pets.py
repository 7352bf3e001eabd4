"""PETS solver tests mirroring ``test/pets_test.jl``."""
import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import PETSConfig
from ratilqr_tpu.models import gmm_integrator
from ratilqr_tpu.problems import GenerativeProblem
from ratilqr_tpu.solvers import pets

N = 20


def _problem():
    # f = x + u + U[0,1)^2 noise, c = Σ|u|, h = 1 (pets_test.jl:12-15).
    def f_stochastic(x, u, key, use_true_model=False):
        return x + u + jax.random.uniform(key, x.shape, dtype=x.dtype)

    return GenerativeProblem(
        f_stochastic=f_stochastic,
        c=lambda k, x, u: jnp.sum(jnp.abs(u)),
        h=lambda x: jnp.asarray(1.0, x.dtype),
        N=N)


def _solver_inputs():
    mu = jnp.zeros((N, 2), jnp.float64)
    sigma = jnp.eye(2, dtype=jnp.float64)[None].repeat(N, 0)
    return mu, sigma


def test_init_state_reset():
    # ctor/initialize! state reset (pets_test.jl:29-41).
    mu, sigma = _solver_inputs()
    st = pets.init_state(mu, sigma)
    assert int(st.iter_current) == 0
    np.testing.assert_array_equal(np.asarray(st.mu), np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(st.sigma), np.asarray(sigma))


def test_compute_cost_matches_independent_recomputation():
    # Cost recomputed independently with the same keys must agree exactly
    # (pets_test.jl:52-63): possible here because c ignores x, so cost only
    # depends on the control sequence (see comment at pets_test.jl:50).
    prob = _problem()
    config = PETSConfig(num_control_samples=6, num_trajectory_samples=4)
    mu, sigma = _solver_inputs()
    us = pets.sample_control_sequences(pets.init_state(mu, sigma),
                                       jax.random.key(1), 6)
    costs = pets.compute_cost(prob, config, jnp.zeros(2), us,
                              jax.random.key(2))
    expected = np.array([
        float(jnp.sum(jnp.abs(us[i]))) + 1.0 for i in range(6)])
    np.testing.assert_allclose(np.asarray(costs), expected, rtol=1e-12)


def test_elite_selection_matches_argsort():
    # Elite selection vs independent argsort (pets_test.jl:66-70).
    config = PETSConfig(num_control_samples=8, num_elite=3)
    us = jax.random.normal(jax.random.key(0), (8, N, 2))
    costs = jax.random.uniform(jax.random.key(1), (8,))
    elites, idx = pets.get_elite_samples(us, costs, 3)
    ref_idx = np.argsort(np.asarray(costs))[:3]
    np.testing.assert_array_equal(np.sort(np.asarray(idx)),
                                  np.sort(ref_idx))
    np.testing.assert_allclose(np.asarray(elites),
                               np.asarray(us)[np.asarray(idx)])


def test_distribution_update_closed_form():
    # Distribution update vs closed-form smoothed mean / Diagonal(var)
    # (pets_test.jl:72-84); Julia `var` is the unbiased estimator.
    mu, sigma = _solver_inputs()
    st = pets.init_state(mu, sigma)
    elites = jax.random.normal(jax.random.key(3), (5, N, 2),
                               dtype=jnp.float64)
    new = pets.compute_new_distribution(st, elites, 0.1)
    e = np.asarray(elites)
    for t in range(N):
        m = e[:, t].mean(axis=0)
        v = e[:, t].var(axis=0, ddof=1)
        np.testing.assert_allclose(np.asarray(new.mu[t]),
                                   0.9 * m + 0.1 * np.zeros(2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(new.sigma[t]),
                                   0.9 * np.diag(v) + 0.1 * np.eye(2),
                                   rtol=1e-12)


def test_step_and_solve_iteration_accounting():
    # step!/solve! iteration accounting (pets_test.jl:87-95).
    prob = _problem()
    config = PETSConfig(num_control_samples=20, num_trajectory_samples=10,
                        num_elite=5, iter_max=5)
    mu, sigma = _solver_inputs()
    st = pets.init_state(mu, sigma)
    st1 = pets.step(prob, config, jnp.zeros(2), st, jax.random.key(0))
    assert int(st1.iter_current) == 1
    out = pets.solve(prob, config, jnp.zeros(2), st, jax.random.key(0))
    assert int(out.iter_current) == config.iter_max
    assert out.mu.shape == (N, 2) and out.sigma.shape == (N, 2, 2)


def test_solve_minimizes_control_cost():
    # With c = Σ|u| the optimal control is 0: CEM should shrink ‖μ‖.
    prob = _problem()
    config = PETSConfig(num_control_samples=40, num_trajectory_samples=4,
                        num_elite=8, iter_max=15, smoothing_factor=0.1)
    mu = 0.5 * jnp.ones((N, 2), jnp.float64)
    sigma = jnp.eye(2, dtype=jnp.float64)[None].repeat(N, 0)
    out = pets.solve(prob, config, jnp.zeros(2), pets.init_state(mu, sigma),
                     jax.random.key(7))
    assert float(jnp.mean(jnp.abs(out.mu))) < float(jnp.mean(jnp.abs(mu)))


def test_use_true_model_switch():
    # The static use_true_model flag must reach the dynamics (GMM vs
    # Gaussian internal model, optimal_control_problems.jl:82-87).
    prob = gmm_integrator(N=10)
    config = PETSConfig(num_control_samples=5, num_trajectory_samples=50)
    mu = jnp.zeros((10, 2), jnp.float64)
    sigma = 0.01 * jnp.eye(2, dtype=jnp.float64)[None].repeat(10, 0)
    us = pets.sample_control_sequences(pets.init_state(mu, sigma),
                                       jax.random.key(1), 5)
    c_int = pets.compute_cost(prob, config, jnp.zeros(2), us,
                              jax.random.key(2), use_true_model=False)
    c_true = pets.compute_cost(prob, config, jnp.zeros(2), us,
                               jax.random.key(2), use_true_model=True)
    # The true GMM has a +0.5 mean drift per step → systematically larger
    # quadratic costs.
    assert float(jnp.mean(c_true)) > float(jnp.mean(c_int))
