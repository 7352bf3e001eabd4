"""On-device closed-loop episode tests (``ratilqr_tpu/mpc_episode.py``).

The pin: one jitted ``lax.scan`` episode must reproduce the host-loop
:class:`MPCDriver` trajectory-for-trajectory — same PRNG key schedule, same
policy execution, same warm-start threading (the reference's usage pattern,
``docs/source/getting-started.md:96-115``, SURVEY.md §3.5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, PETSConfig, \
    ileqg_solve
from ratilqr_tpu.models import gmm_integrator, lqr_problem
from ratilqr_tpu.mpc import MPCDriver, affine_policy_control, \
    shift_warm_start
from ratilqr_tpu.mpc_episode import (PlanOut, make_episode_runner,
                                     make_fleet_runner,
                                     make_gaussian_simulator,
                                     make_ileqg_plan, make_pets_plan,
                                     make_ratilqr_plan)

STEPS = 6


def _stage_cost(prob):
    return lambda k, x, u: prob.c(k, x, u)


def test_episode_matches_host_driver_ileqg():
    """Scan episode ≡ MPCDriver host loop, state-for-state (f64 exact)."""
    prob = lqr_problem(N=8, noise=1e-3)
    cfg = ILEQGConfig()
    key = jax.random.key(7)
    x0 = jnp.array([2.0, -1.0], jnp.float64)
    u0 = jnp.zeros((8, 2), jnp.float64)

    run = make_episode_runner(make_ileqg_plan(prob, cfg, 0.0),
                              make_gaussian_simulator(prob), STEPS,
                              _stage_cost(prob))
    ep = run(x0, u0, key, ())

    driver = MPCDriver(problem=prob,
                       plan=lambda x, u, k: ileqg_solve(prob, cfg, x, u,
                                                        0.0))
    recs = driver.run(x0, u0, key, num_steps=STEPS)

    np.testing.assert_allclose(np.asarray(ep.xs[:-1]),
                               np.stack([r.x for r in recs]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ep.us),
                               np.stack([r.u for r in recs]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ep.values),
                               np.stack([r.value for r in recs]),
                               rtol=1e-12)
    assert not bool(ep.fallbacks.any())
    # Realized cost matches an explicit recomputation.
    total = sum(float(prob.c(jnp.asarray(k), ep.xs[k], ep.us[k]))
                for k in range(STEPS))
    np.testing.assert_allclose(float(ep.total_cost), total, rtol=1e-12)


def test_episode_matches_host_loop_ratilqr_jit():
    """CE warm-start state (μ_init/σ_init adaptation across re-plans,
    ref ``:66-68``) threads through the scan exactly as through a host
    loop around ``ratilqr_jit.solve``."""
    from ratilqr_tpu.solvers import ratilqr, ratilqr_jit

    prob = lqr_problem(N=8, noise=1e-2)
    cfg = CrossEntropyConfig(num_samples=6, num_elite=2, iter_max=2,
                             ileqg=ILEQGConfig(iter_max=10))
    key = jax.random.key(3)
    x0 = jnp.array([1.5, -0.5], jnp.float64)
    u0 = jnp.zeros((8, 2), jnp.float64)
    state0 = ratilqr.init_state(cfg, jnp.float64)

    run = make_episode_runner(make_ratilqr_plan(prob, cfg, 0.1),
                              make_gaussian_simulator(prob), STEPS,
                              _stage_cost(prob))
    ep = run(x0, u0, key, state0)

    # Host loop with the identical key schedule.
    sim = make_gaussian_simulator(prob)
    x, u_warm, st, k = x0, u0, state0, key
    xs, us, vals, thetas = [], [], [], []
    for i in range(STEPS):
        k, k_plan, k_sim = jax.random.split(k, 3)
        res = ratilqr_jit.solve(prob, cfg, st, x, u_warm, k_plan,
                                jnp.asarray(0.1, jnp.float64))
        st = res.state
        u = affine_policy_control(x, res.x, res.l, res.L)
        xs.append(x); us.append(u); vals.append(res.value)
        thetas.append(res.theta_opt)
        x = sim(jnp.asarray(i), x, u, k_sim)
        u_warm = shift_warm_start(res.l)

    np.testing.assert_allclose(np.asarray(ep.xs[:-1]), np.stack(xs),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ep.us), np.stack(us), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ep.values), np.stack(vals),
                               rtol=1e-12)
    # Per-step θ_opt diagnostics surface through the aux channel.
    np.testing.assert_allclose(np.asarray(ep.aux["theta_opt"]),
                               np.stack(thetas), rtol=1e-12)
    # Final warm-start state matches too.
    for a, b in zip(jax.tree_util.tree_leaves(ep.plan_state),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_fallback_on_neurotic_breakdown():
    """noise=1.0 makes every θ>0 infeasible on the LQR fixture (by design);
    the fallback must kick in at every step and reproduce the risk-neutral
    controls."""
    prob = lqr_problem(N=8, noise=1.0)
    cfg = ILEQGConfig()
    key = jax.random.key(11)
    x0 = jnp.array([2.0, -1.0], jnp.float64)
    u0 = jnp.zeros((8, 2), jnp.float64)

    def fb(x, u_warm, k):
        res = ileqg_solve(prob, cfg, x, u_warm, 0.0)
        return PlanOut(x=res.x, l=res.l, L=res.L, value=res.value)

    run = make_episode_runner(make_ileqg_plan(prob, cfg, 0.5),
                              make_gaussian_simulator(prob), STEPS,
                              _stage_cost(prob), fallback=fb)
    ep = run(x0, u0, key, ())
    assert bool(ep.fallbacks.all())
    assert bool(jnp.isfinite(ep.values).all())

    run0 = make_episode_runner(make_ileqg_plan(prob, cfg, 0.0),
                               make_gaussian_simulator(prob), STEPS,
                               _stage_cost(prob))
    ep0 = run0(x0, u0, key, ())
    np.testing.assert_allclose(np.asarray(ep.us), np.asarray(ep0.us),
                               rtol=1e-12)
    assert not bool(ep0.fallbacks.any())


def test_fleet_runner_matches_individual_episodes():
    prob = lqr_problem(N=6, noise=1e-3)
    cfg = ILEQGConfig(iter_max=20)
    x0 = jnp.array([1.0, 1.0], jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    keys = jax.random.split(jax.random.key(0), 4)

    fleet = make_fleet_runner(make_ileqg_plan(prob, cfg, 0.0),
                              make_gaussian_simulator(prob), STEPS,
                              _stage_cost(prob))
    out = fleet(x0, u0, keys, ())
    assert out.xs.shape == (4, STEPS + 1, 2)

    run = make_episode_runner(make_ileqg_plan(prob, cfg, 0.0),
                              make_gaussian_simulator(prob), STEPS,
                              _stage_cost(prob))
    for s in range(4):
        ep = run(x0, u0, keys[s], ())
        np.testing.assert_allclose(np.asarray(out.xs[s]),
                                   np.asarray(ep.xs), rtol=1e-12)
        np.testing.assert_allclose(float(out.total_cost[s]),
                                   float(ep.total_cost), rtol=1e-12)


def test_pets_episode_matches_host_loop():
    from ratilqr_tpu.solvers import pets as pets_mod

    gen = gmm_integrator(N=6)
    cfg = PETSConfig(num_control_samples=16, num_trajectory_samples=4,
                     num_elite=4, iter_max=2)
    sig0 = jnp.eye(2, dtype=jnp.float64)[None].repeat(6, 0)
    mu0 = jnp.zeros((6, 2), jnp.float64)
    x0 = jnp.array([-1.0, -1.0], jnp.float64)
    key = jax.random.key(5)

    def simulate(k, x, u, kk):
        return gen.f_stochastic(x, u, kk, True)

    run = make_episode_runner(make_pets_plan(gen, cfg, sig0), simulate,
                              STEPS, _stage_cost(gen))
    ep = run(x0, mu0, key, ())

    x, mu_warm, k = x0, mu0, key
    xs, us = [], []
    for i in range(STEPS):
        k, k_plan, k_sim = jax.random.split(k, 3)
        st = pets_mod.init_state(mu_warm, sig0)
        out = pets_mod.solve(gen, cfg, x, st, k_plan)
        u = out.mu[0]
        xs.append(x); us.append(u)
        x = simulate(jnp.asarray(i), x, u, k_sim)
        mu_warm = shift_warm_start(out.mu)

    np.testing.assert_allclose(np.asarray(ep.xs[:-1]), np.stack(xs),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ep.us), np.stack(us), rtol=1e-12)


def test_nm_episode_runs_and_threads_state():
    """Jitted Nelder-Mead inside the episode scan: bootstrap once outside
    (all-array NMState requirement), then the θ-init warm start carries
    through the scan."""
    from ratilqr_tpu.config import NelderMeadConfig
    from ratilqr_tpu.mpc_episode import make_nm_plan
    from ratilqr_tpu.solvers import nelder_mead_jit

    prob = lqr_problem(N=6, noise=1e-2)
    cfg = NelderMeadConfig(theta_high_init=0.5, theta_low_init=1e-8,
                           iter_max=10, ileqg=ILEQGConfig(iter_max=10))
    x0 = jnp.array([1.0, -1.0], jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    boot = nelder_mead_jit.bootstrap_state(
        prob, cfg, x0, u0, kl_bound=jnp.asarray(0.1, jnp.float64))
    run = make_episode_runner(make_nm_plan(prob, cfg, 0.1),
                              make_gaussian_simulator(prob), 3,
                              _stage_cost(prob))
    ep = run(x0, u0, jax.random.key(2), boot)
    assert bool(jnp.isfinite(ep.values).all())
    assert bool(jnp.isfinite(ep.total_cost))
    assert ep.xs.shape == (4, 2)


def test_episode_plan_state_checkpoint_roundtrip(tmp_path):
    """Episode chaining across process restarts: the final ``plan_state``
    checkpoints and resumes to an identical continuation."""
    from ratilqr_tpu.solvers import ratilqr
    from ratilqr_tpu.utils.checkpoint import load_state, save_state

    prob = lqr_problem(N=6, noise=1e-2)
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=1,
                             ileqg=ILEQGConfig(iter_max=8))
    run = make_episode_runner(make_ratilqr_plan(prob, cfg, 0.1),
                              make_gaussian_simulator(prob), 3,
                              _stage_cost(prob))
    x0 = jnp.array([1.0, -1.0], jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    ep1 = run(x0, u0, jax.random.key(0), ratilqr.init_state(cfg,
                                                            jnp.float64))

    path = str(tmp_path / "ep_state.ckpt")
    save_state(path, ep1.plan_state)
    restored = load_state(path, ep1.plan_state)

    k2 = jax.random.key(1)
    cont_a = run(ep1.xs[-1], shift_warm_start(ep1.us), k2, ep1.plan_state)
    cont_b = run(ep1.xs[-1], shift_warm_start(ep1.us), k2, restored)
    np.testing.assert_array_equal(np.asarray(cont_a.xs),
                                  np.asarray(cont_b.xs))
    np.testing.assert_array_equal(np.asarray(cont_a.total_cost),
                                  np.asarray(cont_b.total_cost))
