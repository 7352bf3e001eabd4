"""Outer-loop oracle parity: the eager CE/NM oracles (tests/oracle_bilevel.py,
a second independent reading of the reference's ``step!``/``solve!``) must
match both the host-orchestrated and the fully-jitted production paths
decision-for-decision (VERDICT r2 item 3).

The inner iLEQG value function and (for CE) the θ-sampler are shared across
all three paths, so any disagreement is an outer-loop logic divergence:
misread feasibility-rescale branches, NM decision replay, warm-start
mutation, θ-range bookkeeping.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, NelderMeadConfig
from ratilqr_tpu.models import nonlinear_toy
from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit, ratilqr, ratilqr_jit
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve

from oracle_bilevel import oracle_ce_solve, oracle_nm_solve

KL = 1.0


def _fixture():
    prob = nonlinear_toy(N=10)
    x0 = jnp.zeros(2, jnp.float64)
    u0 = 0.1 * jnp.ones((10, 2), jnp.float64)
    return prob, x0, u0


def _value_fn(prob, cfg, x0, u0):
    def value(th):
        v = float(ileqg_solve(prob, cfg.ileqg, x0, u0,
                              jnp.asarray(th, jnp.float64)).value)
        return v
    return value


# --- RAT iLQR++ (Nelder-Mead) ---------------------------------------------

def test_nm_oracle_matches_host_and_jit_warm_chain():
    """Fresh solve (feasibility bootstrap: θ_high_init=500 is deep in
    neurotic-breakdown territory) + two warm-started re-solves (carried
    stale c quirk) across three independent implementations."""
    prob, x0, u0 = _fixture()
    cfg = NelderMeadConfig(theta_high_init=500.0, theta_low_init=1e-8,
                           iter_max=6)
    ostate = {"theta_high_init": cfg.theta_high_init,
              "theta_low_init": cfg.theta_low_init,
              "theta_high": cfg.theta_high_init,
              "theta_low": cfg.theta_low_init,
              "c_high": None, "c_low": None, "iter_current": 0}
    hstate = nelder_mead.init_state(cfg)
    jstate = nelder_mead.init_state(cfg)

    for k in range(3):
        xk = x0 + 0.05 * k
        th_o, c_o = oracle_nm_solve(
            _value_fn(prob, cfg, xk, u0), kl_bound=KL, state=ostate,
            alpha=cfg.alpha, beta=cfg.beta, gamma=cfg.gamma, eps=cfg.eps,
            lam=cfg.lam, iter_max=cfg.iter_max)
        rh = nelder_mead.solve(prob, cfg, hstate, xk, u0, kl_bound=KL)
        hstate = rh.state
        rj = nelder_mead_jit.solve(prob, cfg, jstate, xk, u0, kl_bound=KL)
        jstate = rj.state

        for tag, th, c, st in (("host", float(rh.theta_opt),
                                float(rh.value), hstate),
                               ("jit", float(rj.theta_opt),
                                float(rj.value), jstate)):
            np.testing.assert_allclose(th, th_o, rtol=1e-9,
                                       err_msg=f"theta_opt {tag} k={k}")
            np.testing.assert_allclose(c, c_o, rtol=1e-9,
                                       err_msg=f"value {tag} k={k}")
            np.testing.assert_allclose(float(st.theta_high_init),
                                       ostate["theta_high_init"], rtol=1e-9)
            np.testing.assert_allclose(float(st.theta_low_init),
                                       ostate["theta_low_init"], rtol=1e-12)
            np.testing.assert_allclose(float(st.theta_high),
                                       ostate["theta_high"], rtol=1e-9)
            np.testing.assert_allclose(float(st.theta_low),
                                       ostate["theta_low"], rtol=1e-9)
            np.testing.assert_allclose(float(st.c_high), ostate["c_high"],
                                       rtol=1e-9)
            np.testing.assert_allclose(float(st.c_low), ostate["c_low"],
                                       rtol=1e-9)
            assert int(st.iter_current) == ostate["iter_current"], tag
    # The bootstrap must actually have fired (θ_high_init halved).
    assert ostate["theta_high_init"] < 500.0


def test_nm_oracle_kl_zero():
    prob, x0, u0 = _fixture()
    cfg = NelderMeadConfig(iter_max=4)
    ostate = {"theta_high_init": cfg.theta_high_init,
              "theta_low_init": cfg.theta_low_init,
              "theta_high": cfg.theta_high_init,
              "theta_low": cfg.theta_low_init,
              "c_high": None, "c_low": None, "iter_current": 0}
    th_o, c_o = oracle_nm_solve(_value_fn(prob, cfg, x0, u0), kl_bound=0.0,
                                state=ostate, iter_max=cfg.iter_max)
    rh = nelder_mead.solve(prob, cfg, nelder_mead.init_state(cfg), x0, u0,
                           kl_bound=0.0)
    assert th_o == 0.0 == float(rh.theta_opt)
    np.testing.assert_allclose(float(rh.value), c_o, rtol=1e-9)


# --- RAT iLQR (Cross-Entropy) -----------------------------------------------

_Z = np.linspace(-1.1, 1.3, 7)  # deterministic stand-in for N(0,1) draws


def _fake_draw_jax(key, mu, sigma, num_samples, dtype=jnp.float64):
    """Deterministic positive θ sampler, pure function of (μ, σ) — replaces
    ``get_positive_samples`` in the host and jit paths so the oracle can
    replay the identical sample sequence."""
    z = jnp.asarray(_Z[:num_samples], dtype)
    return jnp.abs(jnp.asarray(mu, dtype) + jnp.asarray(sigma, dtype) * z
                   ) + jnp.asarray(1e-4, dtype)


def _fake_draw_eager(num_samples):
    def draw(mu, sigma):
        return [abs(mu + sigma * z) + 1e-4 for z in _Z[:num_samples]]
    return draw


@pytest.fixture()
def _injected_sampler(monkeypatch):
    monkeypatch.setattr(ratilqr, "get_positive_samples", _fake_draw_jax)
    monkeypatch.setattr(ratilqr_jit, "get_positive_samples", _fake_draw_jax)
    ratilqr.make_cost_fn.cache_clear()
    ratilqr_jit.solve.clear_cache()
    yield
    ratilqr_jit.solve.clear_cache()  # drop traces that captured the fake
    ratilqr.make_cost_fn.cache_clear()


def _ce_state_dict(cfg):
    return {"mu_init": cfg.mu_init, "sigma_init": cfg.sigma_init,
            "mu": cfg.mu_init, "sigma": cfg.sigma_init,
            "theta_min": math.inf, "theta_max": 0.0, "iter_current": 0}


def _assert_ce_state(st, ostate, tag):
    np.testing.assert_allclose(float(st.mu_init), ostate["mu_init"],
                               rtol=1e-9, err_msg=tag)
    np.testing.assert_allclose(float(st.sigma_init), ostate["sigma_init"],
                               rtol=1e-9, err_msg=tag)
    np.testing.assert_allclose(float(st.mu), ostate["mu"], rtol=1e-9,
                               err_msg=tag)
    np.testing.assert_allclose(float(st.sigma), ostate["sigma"], rtol=1e-9,
                               err_msg=tag)
    np.testing.assert_allclose(float(st.theta_min), ostate["theta_min"],
                               rtol=1e-9, err_msg=tag)
    np.testing.assert_allclose(float(st.theta_max), ostate["theta_max"],
                               rtol=1e-9, err_msg=tag)


def _run_ce_three_ways(cfg, kl, n_calls=2):
    prob, x0, u0 = _fixture()
    ostate = _ce_state_dict(cfg)
    hstate = ratilqr.init_state(cfg)
    jstate = ratilqr.init_state(cfg)
    for k in range(n_calls):
        xk = x0 + 0.05 * k
        th_o, c_o, _ = oracle_ce_solve(
            _value_fn(prob, cfg, xk, u0),
            _fake_draw_eager(cfg.num_samples), kl_bound=kl, state=ostate,
            num_samples=cfg.num_samples, num_elite=cfg.num_elite,
            iter_max=cfg.iter_max, lam=cfg.lam,
            use_theta_max=cfg.use_theta_max)
        rh = ratilqr.solve(prob, cfg, hstate, xk, u0, jax.random.key(0),
                           kl_bound=kl)
        hstate = rh.state
        rj = ratilqr_jit.solve(prob, cfg, jstate, xk, u0, jax.random.key(0),
                               jnp.asarray(kl, jnp.float64))
        jstate = rj.state
        for tag, r, st in (("host", rh, hstate), ("jit", rj, jstate)):
            np.testing.assert_allclose(float(r.theta_opt), th_o, rtol=1e-9,
                                       err_msg=f"theta_opt {tag} k={k}")
            np.testing.assert_allclose(float(r.value), c_o, rtol=1e-9,
                                       err_msg=f"value {tag} k={k}")
            _assert_ce_state(st, ostate, f"{tag} k={k}")
    return ostate


def test_ce_oracle_grow_branch_warm_chain(_injected_sampler):
    """All-valid iteration 1 → μ_init/σ_init GROW by 1/λ and persist into
    the next MPC solve (ref :299-305) — replayed through three paths."""
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=3,
                             mu_init=0.1, sigma_init=0.05)
    ostate = _run_ce_three_ways(cfg, KL)
    assert ostate["mu_init"] > 0.1  # the grow branch fired (twice)


def test_ce_oracle_shrink_branch(_injected_sampler):
    """Iteration-1 feasibility rescale (ref :293-298): μ_init=500 is deep
    in breakdown territory, the redraw loop must shrink and converge
    identically in all three paths."""
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=2,
                             mu_init=500.0, sigma_init=1.0)
    ostate = _run_ce_three_ways(cfg, KL, n_calls=1)
    assert ostate["mu_init"] < 500.0  # the shrink branch fired


def test_ce_oracle_use_theta_max(_injected_sampler):
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=2,
                             mu_init=0.1, sigma_init=0.05,
                             use_theta_max=True)
    _run_ce_three_ways(cfg, KL, n_calls=1)


def test_ce_oracle_kl_zero(_injected_sampler):
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2, iter_max=2,
                             mu_init=0.1, sigma_init=0.05)
    prob, x0, u0 = _fixture()
    ostate = _ce_state_dict(cfg)
    th_o, c_o, _ = oracle_ce_solve(
        _value_fn(prob, cfg, x0, u0), _fake_draw_eager(cfg.num_samples),
        kl_bound=0.0, state=ostate, num_samples=cfg.num_samples,
        num_elite=cfg.num_elite, iter_max=cfg.iter_max, lam=cfg.lam)
    rh = ratilqr.solve(prob, cfg, ratilqr.init_state(cfg), x0, u0,
                       jax.random.key(0), kl_bound=0.0)
    assert th_o == 0.0 == float(rh.theta_opt)
    np.testing.assert_allclose(float(rh.value), c_o, rtol=1e-9)
