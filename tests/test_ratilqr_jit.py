"""Fully-jitted RAT iLQR tests: single-dispatch solve semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import CrossEntropyConfig, ileqg_solve
from ratilqr_tpu.models import nonlinear_toy
from ratilqr_tpu.solvers import ratilqr, ratilqr_jit


def _fixture():
    prob = nonlinear_toy(N=10)
    return prob, jnp.zeros(2, jnp.float64), 0.1 * jnp.ones((10, 2),
                                                           jnp.float64)


def test_jit_solve_end_to_end():
    prob, x0, u0 = _fixture()
    config = CrossEntropyConfig(num_samples=4)
    state = ratilqr.init_state(config)
    res = ratilqr_jit.solve(prob, config, state, x0, u0,
                            jax.random.key(12344), 1.0)
    assert np.isfinite(float(res.value))
    assert float(res.theta_opt) > 0.0
    assert 0.0 < float(res.theta_min) <= float(res.theta_max)
    # Warm-start state usable for the next re-plan within the same jit.
    res2 = ratilqr_jit.solve(prob, config, res.state, x0, u0,
                             jax.random.key(5), 1.0)
    assert np.isfinite(float(res2.value))


def test_jit_kl_zero_matches_ilqg():
    prob, x0, u0 = _fixture()
    config = CrossEntropyConfig(num_samples=4)
    state = ratilqr.init_state(config)
    res = ratilqr_jit.solve(prob, config, state, x0, u0, jax.random.key(0),
                            0.0)
    ref = ileqg_solve(prob, config.ileqg, x0, u0, 0.0)
    assert float(res.theta_opt) == 0.0
    np.testing.assert_allclose(float(res.value), float(ref.value),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.l), np.asarray(ref.l),
                               rtol=1e-12)


def test_jit_feasibility_redraw_shrinks_inits():
    prob, x0, u0 = _fixture()
    config = CrossEntropyConfig(num_samples=4, num_elite=2, mu_init=500.0,
                                sigma_init=1.0)
    state = ratilqr.init_state(config)
    res = ratilqr_jit.solve(prob, config, state, x0, u0, jax.random.key(3),
                            1.0)
    assert np.isfinite(float(res.value))
    assert float(res.state.mu_init) < 500.0


def test_jit_matches_host_path_same_key():
    # Both paths split the PRNG key once per redraw round in the same order
    # and draw via the same truncated-normal primitive, so with a shared key
    # the θ sample sequences are identical draw-for-draw and the two solves
    # must agree to numerical precision — not just "same ballpark".
    prob, x0, u0 = _fixture()
    config = CrossEntropyConfig(num_samples=6)
    r_host = ratilqr.solve(prob, config, ratilqr.init_state(config),
                           x0, u0, jax.random.key(7), kl_bound=1.0)
    r_jit = ratilqr_jit.solve(prob, config, ratilqr.init_state(config),
                              x0, u0, jax.random.key(7), 1.0)
    np.testing.assert_allclose(float(r_jit.theta_opt),
                               float(r_host.theta_opt), rtol=1e-9)
    np.testing.assert_allclose(float(r_jit.value), float(r_host.value),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r_jit.l), np.asarray(r_host.l),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(r_jit.state.mu),
                               float(r_host.state.mu), rtol=1e-9)
    np.testing.assert_allclose(float(r_jit.state.sigma),
                               float(r_host.state.sigma), rtol=1e-9)
    assert not bool(r_jit.redraws_exhausted)
    assert not bool(r_host.redraws_exhausted)


def test_fleet_vmap_over_full_solve():
    # Fleet MPC: vmap the entire single-dispatch RAT iLQR over robots —
    # nested vmap (fleet x theta-bank) over every while_loop and the
    # custom_vmap Riccati dispatch.
    from ratilqr_tpu.models import unicycle

    dt = jnp.float64
    prob = unicycle(N=8, dtype=dt)
    config = CrossEntropyConfig(num_samples=3, mu_init=0.005,
                                sigma_init=0.01,
                                ileqg=__import__("ratilqr_tpu").ILEQGConfig(
                                    iter_max=4))
    F = 4
    states = jax.vmap(lambda _: ratilqr.init_state(config, dt))(
        jnp.arange(F))
    x0s = 0.2 * jax.random.normal(jax.random.key(0), (F, 3), dt)
    u0 = jnp.zeros((8, 2), dt)
    keys = jax.random.split(jax.random.key(1), F)
    fleet = jax.jit(jax.vmap(
        lambda st, x0, key: ratilqr_jit.solve(prob, config, st, x0, u0,
                                              key, jnp.asarray(0.05, dt)),
        in_axes=(0, 0, 0)))
    res = fleet(states, x0s, keys)
    assert res.value.shape == (F,)
    assert np.all(np.isfinite(np.asarray(res.value)))
    # each robot matches its individual solve
    single = ratilqr_jit.solve(prob, config,
                               jax.tree_util.tree_map(lambda a: a[0],
                                                      states),
                               x0s[0], u0, keys[0], jnp.asarray(0.05, dt))
    np.testing.assert_allclose(float(res.value[0]), float(single.value),
                               rtol=1e-9)


def test_kl_zero_returns_reference_theta_range():
    """kl_bound == 0 returns the reference's literal θ-range (0.0, 0.0)
    (``cross_entropy_bilevel_optimization.jl:408``) in BOTH paths — not
    the solver state's initialize!-reset fields."""
    prob, x0, u0 = _fixture()
    config = CrossEntropyConfig(num_samples=3)
    rj = ratilqr_jit.solve(prob, config, ratilqr.init_state(config), x0, u0,
                           jax.random.key(0), 0.0)
    assert float(rj.theta_min) == 0.0 and float(rj.theta_max) == 0.0
    rh = ratilqr.solve(prob, config, ratilqr.init_state(config), x0, u0,
                       jax.random.key(0), kl_bound=0.0)
    assert float(rh.theta_min) == 0.0 and float(rh.theta_max) == 0.0
    # The STATE keeps the initialize!-reset fields (ref struct semantics).
    assert np.isinf(float(rj.state.theta_min))


def test_unsolvable_problem_surfaces_final_failure():
    """A problem whose neurotic-breakdown check fails at EVERY θ including
    0 (non-PSD W → M = W⁻¹ − θS is never PSD; the reference's final-solve
    retry loop would spin forever, ref :390-414) must exhaust the θ-backoff
    (incl. the forced terminal θ = 0 attempt) and SURFACE the failure —
    ``final_failed=True`` with ``value = Inf`` — instead of silently
    returning garbage controls."""
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.problems import RiskSensitiveProblem

    prob = RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * (x @ x) + 0.5 * (u @ u),
        h=lambda x: 0.5 * (x @ x),
        W=lambda k: -0.01 * jnp.eye(2), N=6)
    config = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=2,
                                ileqg=ILEQGConfig(iter_max=5))
    x0 = jnp.array([1.0, -1.0], jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    res = ratilqr_jit.solve(prob, config, ratilqr.init_state(config), x0,
                            u0, jax.random.key(0),
                            jnp.asarray(0.1, jnp.float64))
    assert bool(res.redraws_exhausted)   # no feasible θ ever drawn
    assert bool(res.final_failed)        # even θ = 0 failed
    assert float(res.theta_opt) == 0.0   # the terminal attempt WAS θ = 0
    assert np.isinf(float(res.value))    # Inf-masking invariant holds
