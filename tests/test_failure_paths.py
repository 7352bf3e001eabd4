"""Failure-path coverage: budget exhaustion semantics that replace the
reference's unbounded loops (SURVEY.md §7 'exceptions become masks')."""
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.problems import RiskSensitiveProblem


def _overshoot_problem(N=8):
    # sqrt-flattened cost: away from the origin its curvature vanishes, so
    # the quadratic model grossly overestimates the step scale and the full
    # Newton step (eps=1) overshoots far past the optimum -> first
    # line-search trials are rejected and eps backtracks.
    def bowl(x):
        return jnp.sqrt(0.01 + x @ x)

    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: bowl(x) + 1e-4 * (u @ u),
        h=bowl,
        W=lambda k: 0.01 * jnp.eye(2, dtype=jnp.float64),
        N=N)


def test_line_search_backtracks_on_overshoot():
    prob = _overshoot_problem()
    res = ileqg_solve(prob, ILEQGConfig(iter_max=3),
                      jnp.ones(2, jnp.float64) * 5.0,
                      jnp.zeros((8, 2), jnp.float64), 0.0)
    assert not bool(res.failed)
    hist = np.asarray(res.eps_history)[:int(res.eps_count)]
    # at least one rejected trial (eps < 1 among accepted steps)
    assert np.any(hist[:, 0] < 1.0)


def test_ls_trial_cap_marks_failure():
    # With a 1-trial budget the overshooting first step exhausts the line
    # search -> lane declared failed with value Inf (the reference would
    # keep halving eps forever).
    prob = _overshoot_problem()
    res = ileqg_solve(prob, ILEQGConfig(iter_max=1, ls_max_trials=1),
                      jnp.ones(2, jnp.float64) * 5.0,
                      jnp.zeros((8, 2), jnp.float64), 0.0)
    assert bool(res.failed)
    assert np.isinf(float(res.value))


def test_eps_history_cap_saturates_without_error():
    prob = _overshoot_problem()
    cfg = ILEQGConfig(iter_max=5, eps_history_cap=2)
    res = ileqg_solve(prob, cfg, jnp.ones(2, jnp.float64) * 5.0,
                      jnp.zeros((8, 2), jnp.float64), 0.0)
    assert not bool(res.failed)
    assert res.eps_history.shape == (2, 2)
    assert int(res.eps_count) >= 2  # counter keeps counting past the cap


def _always_infeasible_problem(N=6):
    # Enormous noise covariance: M = W^-1 - theta*S loses PSD for any
    # theta above ~1e-12, far below anything the CE sampler can reach even
    # after its full shrink budget -> every theta>0 lane is a neurotic
    # breakdown, permanently.
    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: x @ x + u @ u,
        h=lambda x: x @ x,
        W=lambda k: 1e12 * jnp.eye(2, dtype=jnp.float64),
        N=N)


def test_host_ce_redraw_budget_raises():
    # The reference's feasibility redraw loop
    # (cross_entropy_bilevel_optimization.jl:265-312) would hang here; the
    # host path bounds it and surfaces the failure.
    import jax
    import pytest

    from ratilqr_tpu import CrossEntropyConfig
    from ratilqr_tpu.solvers import ratilqr

    prob = _always_infeasible_problem()
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2,
                             ileqg=ILEQGConfig(iter_max=3))
    with pytest.raises(RuntimeError, match="redraw budget exhausted"):
        ratilqr.solve(prob, cfg, ratilqr.init_state(cfg),
                      jnp.ones(2, jnp.float64), jnp.zeros((6, 2), jnp.float64),
                      jax.random.key(0), kl_bound=1.0)


def test_jit_ce_redraw_budget_sets_flag():
    # Same problem through the fully-jitted path: no hang, no exception —
    # the exhaustion is reported in RATiLQRResult.redraws_exhausted.
    import jax

    from ratilqr_tpu import CrossEntropyConfig
    from ratilqr_tpu.solvers import ratilqr, ratilqr_jit

    prob = _always_infeasible_problem()
    cfg = CrossEntropyConfig(num_samples=4, num_elite=2,
                             ileqg=ILEQGConfig(iter_max=3))
    res = ratilqr_jit.solve(prob, cfg, ratilqr.init_state(cfg),
                            jnp.ones(2, jnp.float64),
                            jnp.zeros((6, 2), jnp.float64),
                            jax.random.key(0), 1.0)
    assert bool(res.redraws_exhausted)

    # A feasible problem must NOT set the flag.
    from ratilqr_tpu.models import nonlinear_toy
    ok = ratilqr_jit.solve(nonlinear_toy(N=6), cfg,
                           ratilqr.init_state(cfg),
                           jnp.zeros(2, jnp.float64),
                           0.1 * jnp.ones((6, 2), jnp.float64),
                           jax.random.key(1), 1.0)
    assert not bool(ok.redraws_exhausted)


def _nan_everywhere_problem(N=6):
    # Dynamics NaN at every state -> the iLEQG solve fails for EVERY theta,
    # including theta=0: no amount of theta-shrinking reaches feasibility.
    return RiskSensitiveProblem(
        f=lambda x, u: jnp.sqrt(x - 100.0) + u,   # sqrt of negative: NaN
        c=lambda k, x, u: x @ x + u @ u,
        h=lambda x: x @ x,
        W=lambda k: 0.1 * jnp.eye(2, dtype=jnp.float64),
        N=N)


def test_host_nm_bootstrap_budget_terminates():
    # The reference's feasibility bootstrap (nm….jl:283-304) would halve
    # theta forever on a problem infeasible at EVERY theta; the host path
    # bounds it and surfaces the failure as value=Inf.
    from ratilqr_tpu import NelderMeadConfig
    from ratilqr_tpu.solvers import nelder_mead

    prob = _nan_everywhere_problem()
    x0 = jnp.zeros(2, jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    config = NelderMeadConfig()
    res = nelder_mead.solve(prob, config, nelder_mead.init_state(config),
                            x0, u0, kl_bound=1.0)
    assert not np.isfinite(float(res.value))


def test_jit_nm_bootstrap_budget_terminates():
    # Same bound in the fully-jitted state machine (bounded while_loop).
    from ratilqr_tpu import NelderMeadConfig
    from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit

    prob = _nan_everywhere_problem()
    x0 = jnp.zeros(2, jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    config = NelderMeadConfig()
    res = nelder_mead_jit.solve(prob, config,
                                nelder_mead.init_state(config),
                                x0, u0, kl_bound=1.0)
    assert not np.isfinite(float(res.value))
