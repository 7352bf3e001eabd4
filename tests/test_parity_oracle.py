"""Parity: jitted scan/mask solver vs the eager exception-based oracle.

The oracle (tests/oracle.py) re-implements the reference's `solve!` control
flow statement-for-statement with real exceptions and Python loops; the
production solver compiles the same semantics into lax primitives with
failure masks.  Agreement here is the round-trippable stand-in for the
"control-sequence MSE < 1e-4 vs the Julia reference" baseline check
(BASELINE.md) — asserted far tighter since both run float64.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.models import (double_integrator, lqr_problem,
                                nonlinear_toy, unicycle)
from tests.oracle import NeuroticBreakdown, oracle_solve

CASES = [
    ("lqr_theta0", lambda: lqr_problem(N=10), np.zeros(2),
     np.ones((10, 2)), 0.0),
    ("lqr_risk", lambda: lqr_problem(N=10, noise=0.01), np.zeros(2),
     np.ones((10, 2)), 0.3),
    ("nonlinear_theta0", lambda: nonlinear_toy(N=10), np.zeros(2),
     0.1 * np.ones((10, 2)), 0.0),
    ("nonlinear_risk", lambda: nonlinear_toy(N=10), np.zeros(2),
     0.1 * np.ones((10, 2)), 0.5),
    ("unicycle", lambda: unicycle(N=20), np.zeros(3),
     0.05 * np.ones((20, 2)), 0.01),
    ("integrator_adaptive", lambda: double_integrator(N=10, noise=0.01),
     np.array([1.0, -2.0]), np.zeros((10, 2)), 0.1),
]


@pytest.mark.parametrize("name,mk,x0,u0,theta",
                         CASES, ids=[c[0] for c in CASES])
def test_solver_matches_oracle(name, mk, x0, u0, theta):
    prob = mk()
    cfg = ILEQGConfig(iter_max=20)
    res = ileqg_solve(prob, cfg, jnp.asarray(x0), jnp.asarray(u0), theta)
    assert not bool(res.failed)
    x_o, l_o, L_o, v_o, hist_o = oracle_solve(prob, x0, u0, theta,
                                              iter_max=20)

    mse_l = float(np.mean((np.asarray(res.l) - l_o) ** 2))
    assert mse_l < 1e-10, f"control MSE {mse_l}"
    np.testing.assert_allclose(float(res.value), v_o, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), x_o, rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.L), L_o, rtol=1e-6,
                               atol=1e-8)
    # ε-history parity: same trial count, same (ε, Δvalue) records.
    hist = np.asarray(res.eps_history)[:int(res.eps_count)]
    assert len(hist) == len(hist_o)
    np.testing.assert_allclose(hist, np.asarray(hist_o), rtol=1e-6,
                               atol=1e-8)


def test_oracle_neurotic_breakdown_matches_masked_failure():
    prob = lqr_problem(N=10)  # W = I → θ=0.5 infeasible from zero gains
    with pytest.raises(NeuroticBreakdown):
        oracle_solve(prob, np.zeros(2), np.ones((10, 2)), 0.5)
    res = ileqg_solve(prob, ILEQGConfig(), jnp.zeros(2),
                      jnp.ones((10, 2)), 0.5)
    assert bool(res.failed) and np.isinf(float(res.value))


def test_adaptive_eps_parity():
    prob = nonlinear_toy(N=10)
    cfg = ILEQGConfig(adaptive_eps_init=True, iter_max=15)
    res = ileqg_solve(prob, cfg, jnp.zeros(2), 0.1 * jnp.ones((10, 2)),
                      0.2)
    x_o, l_o, L_o, v_o, hist_o = oracle_solve(
        prob, np.zeros(2), 0.1 * np.ones((10, 2)), 0.2,
        adaptive_eps_init=True, iter_max=15)
    assert float(np.mean((np.asarray(res.l) - l_o) ** 2)) < 1e-10
    np.testing.assert_allclose(float(res.value), v_o, rtol=1e-8)
