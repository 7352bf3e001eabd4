"""Randomized oracle-parity sweep: the jitted solver must match the eager
exception-based oracle (``tests/oracle.py``) on RANDOM problems, not just
the fixed fixtures — dynamics, costs, noise scale, horizon, θ, and start
state all drawn per seed.  Failure parity included: wherever the oracle
raises ``NeuroticBreakdown`` (the reference's assert, ``ileqg.jl:366,440``)
the solver must latch ``failed`` with ``value = Inf``, and vice versa.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.problems import RiskSensitiveProblem
from tests.oracle import NeuroticBreakdown, oracle_solve

SEEDS = list(range(10))


def _random_problem(rng: np.random.Generator):
    """Random linear(+optional sin twist) dynamics with random quadratic
    costs.  Captures only numpy/python constants (CLAUDE.md invariant)."""
    n = int(rng.integers(2, 4))
    m = int(rng.integers(1, n + 1))
    N = int(rng.integers(6, 14))
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    B = rng.standard_normal((n, m)) / math.sqrt(m)
    Qh = rng.standard_normal((n, n)) / n
    Q = Qh @ Qh.T + 0.1 * np.eye(n)
    Rh = rng.standard_normal((m, m)) / m
    R = Rh @ Rh.T + 0.5 * np.eye(m)
    w = float(10.0 ** rng.uniform(-4, -1))
    nonlinear = bool(rng.random() < 0.5)
    k_sin = float(rng.uniform(0.0, 0.2)) if nonlinear else 0.0

    def f(x, u):
        xn = jnp.asarray(A, x.dtype) @ x + jnp.asarray(B, x.dtype) @ u
        return xn + k_sin * jnp.sin(x)

    def c(k, x, u):
        return 0.5 * (x @ jnp.asarray(Q, x.dtype) @ x
                      + u @ jnp.asarray(R, u.dtype) @ u)

    def h(x):
        return 0.5 * (x @ jnp.asarray(Q, x.dtype) @ x)

    prob = RiskSensitiveProblem(
        f=f, c=c, h=h, W=lambda k: jnp.asarray(w * np.eye(n)), N=N)
    x0 = rng.standard_normal(n)
    u0 = 0.1 * rng.standard_normal((N, m))
    return prob, x0, u0


@pytest.mark.parametrize("seed", SEEDS)
def test_random_problem_matches_oracle(seed):
    rng = np.random.default_rng(1234 + seed)
    prob, x0, u0 = _random_problem(rng)
    # θ mix: risk-neutral, moderate risk, aggressive (often infeasible).
    theta = [0.0, float(abs(rng.normal(0.0, 0.1))),
             float(rng.uniform(1.0, 20.0))][seed % 3]
    cfg = ILEQGConfig(iter_max=20)

    oracle_failed = False
    try:
        x_o, l_o, L_o, v_o, hist_o = oracle_solve(prob, x0, u0, theta,
                                                  iter_max=20)
    except NeuroticBreakdown:
        oracle_failed = True

    res = ileqg_solve(prob, cfg, jnp.asarray(x0), jnp.asarray(u0), theta)

    assert bool(res.failed) == oracle_failed, (
        f"failure parity broke: solver failed={bool(res.failed)}, "
        f"oracle failed={oracle_failed} (θ={theta})")
    if oracle_failed:
        assert np.isinf(float(res.value))
        return
    mse_l = float(np.mean((np.asarray(res.l) - l_o) ** 2))
    assert mse_l < 1e-10, f"control MSE {mse_l} (θ={theta})"
    np.testing.assert_allclose(float(res.value), v_o, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), x_o, rtol=1e-6,
                               atol=1e-8)
    hist = np.asarray(res.eps_history)[:int(res.eps_count)]
    assert len(hist) == len(hist_o)
    np.testing.assert_allclose(hist, np.asarray(hist_o), rtol=1e-6,
                               atol=1e-8)


@pytest.mark.parametrize("seed", range(5))
def test_nm_jit_matches_host_on_random_problems(seed):
    """RAT iLQR++ decision parity under fuzz: the speculative-bank jitted
    Nelder-Mead must reproduce the host-orchestrated solver's decisions
    (θ_opt, value, controls, warm-start state) on random problems — both
    paths are deterministic given the problem, so parity is exact up to
    float associativity."""
    from ratilqr_tpu.config import NelderMeadConfig
    from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit

    rng = np.random.default_rng(77 + seed)
    prob, x0, u0 = _random_problem(rng)
    kl = [0.05, 0.5, 3.0][seed % 3]
    cfg = NelderMeadConfig(iter_max=15, ileqg=ILEQGConfig(iter_max=10))

    rh = nelder_mead.solve(prob, cfg, nelder_mead.init_state(cfg),
                           jnp.asarray(x0), jnp.asarray(u0), kl_bound=kl)
    rj = nelder_mead_jit.solve(prob, cfg, nelder_mead.init_state(cfg),
                               jnp.asarray(x0), jnp.asarray(u0),
                               kl_bound=kl)
    np.testing.assert_allclose(float(rj.theta_opt), float(rh.theta_opt),
                               rtol=1e-9)
    np.testing.assert_allclose(float(rj.value), float(rh.value),
                               rtol=1e-9, equal_nan=True)
    if math.isfinite(float(rh.value)):
        np.testing.assert_allclose(np.asarray(rj.l), np.asarray(rh.l),
                                   atol=1e-9)
    # Warm-start chain: a second solve from each path's returned state
    # must also agree (the reference's cross-solve c_high/c_low carry).
    rh2 = nelder_mead.solve(prob, cfg, rh.state, jnp.asarray(x0),
                            jnp.asarray(u0), kl_bound=kl)
    rj2 = nelder_mead_jit.solve(prob, cfg, rj.state, jnp.asarray(x0),
                                jnp.asarray(u0), kl_bound=kl)
    np.testing.assert_allclose(float(rj2.theta_opt), float(rh2.theta_opt),
                               rtol=1e-9)
    np.testing.assert_allclose(float(rj2.value), float(rh2.value),
                               rtol=1e-9, equal_nan=True)
