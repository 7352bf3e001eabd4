"""Randomized decision-replay fuzz for the jitted RAT iLQR++ path
(round-4 VERDICT item 6).

``tests/test_parity_fuzz.py`` fuzzes the inner solver; the NM jit's
decision replay — 6/78/942-lane speculation trees, the merged refresh
bank, the structural carried-state handling — was pinned only on fixed
fixtures.  Here every scenario draws a random problem and sweeps the
full decision surface: ``speculation_depth`` ∈ {1,2,3} ×
``refresh_carried_costs`` ∈ {False,True} × a 3-re-plan warm-start chain
at perturbed states, asserting θ_opt / value / warm-start-state parity
with the host-orchestrated path (which is itself pinned to the
reference, ``nelder_mead_bilevel_optimization.jl:174-252``) at EVERY
step of the chain.  Both paths are deterministic given the problem, so
parity is exact up to float associativity.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import ILEQGConfig
from ratilqr_tpu.config import NelderMeadConfig
from ratilqr_tpu.solvers import nelder_mead, nelder_mead_jit

from tests.test_parity_fuzz import _random_problem

N_SCENARIOS = 54  # ≥50; divisible by the 6 depth×refresh combinations


@pytest.fixture(autouse=True)
def _clear_jit_caches_per_scenario():
    """The XLA:CPU JIT segfaults once a process accumulates too much
    compiled code (see conftest's module-level mitigation); 54 scenarios
    × a full NM-jit program each overflows it WITHIN this module
    (measured: SIGSEGV in backend_compile_and_load after ~11 scenarios).
    Every scenario uses a fresh random problem, so nothing is shared
    across tests and per-test clearing costs no recompiles."""
    yield
    from ratilqr_tpu.ops import riccati
    from ratilqr_tpu.solvers import ileqg as ileqg_mod
    from ratilqr_tpu.solvers import ratilqr as ratilqr_mod
    ileqg_mod.make_batched_solver.cache_clear()
    ratilqr_mod.make_cost_fn.cache_clear()
    riccati._make_core.cache_clear()
    jax.clear_caches()


def _state_close(sj, sh):
    np.testing.assert_allclose(float(sj.theta_high_init),
                               float(sh.theta_high_init), rtol=1e-12)
    np.testing.assert_allclose(float(sj.theta_low_init),
                               float(sh.theta_low_init), rtol=1e-12)
    np.testing.assert_allclose(float(sj.theta_high), float(sh.theta_high),
                               rtol=1e-9)
    np.testing.assert_allclose(float(sj.theta_low), float(sh.theta_low),
                               rtol=1e-9)
    np.testing.assert_allclose(float(sj.c_high), float(sh.c_high),
                               rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(float(sj.c_low), float(sh.c_low),
                               rtol=1e-9, equal_nan=True)
    assert int(sj.iter_current) == int(sh.iter_current)


@pytest.mark.parametrize("seed", range(N_SCENARIOS))
def test_nm_jit_replay_fuzz(seed):
    rng = np.random.default_rng(90210 + seed)
    prob, x0, u0 = _random_problem(rng)
    depth = 1 + seed % 3
    refresh = bool((seed // 3) % 2)
    # kl mix spans easy, moderate and frequently-infeasible regimes so the
    # bootstrap ladders and Inf-masked lanes get exercised, not just the
    # happy path.
    kl = float(10.0 ** rng.uniform(-2.0, 0.8))
    cfg = NelderMeadConfig(iter_max=10, speculation_depth=depth,
                           refresh_carried_costs=refresh,
                           ileqg=ILEQGConfig(iter_max=8))

    sh = sj = nelder_mead.init_state(cfg)
    x = jnp.asarray(x0)
    u = jnp.asarray(u0)
    for step in range(3):
        rh = nelder_mead.solve(prob, cfg, sh, x, u, kl_bound=kl)
        rj = nelder_mead_jit.solve(prob, cfg, sj, x, u, kl_bound=kl)
        ctx = (f"seed={seed} step={step} depth={depth} refresh={refresh} "
               f"kl={kl:.4g}")
        np.testing.assert_allclose(
            float(rj.theta_opt), float(rh.theta_opt), rtol=1e-9,
            err_msg=ctx)
        np.testing.assert_allclose(
            float(rj.value), float(rh.value), rtol=1e-9, equal_nan=True,
            err_msg=ctx)
        if math.isfinite(float(rh.value)):
            np.testing.assert_allclose(np.asarray(rj.l), np.asarray(rh.l),
                                       atol=1e-9, err_msg=ctx)
        _state_close(rj.state, rh.state)
        sh, sj = rh.state, rj.state
        # Warm-start the next re-plan the MPC way: shifted schedule at a
        # perturbed state (the regime where the stale-c quirk and the
        # refresh bank actually differ in behavior).
        x = x + jnp.asarray(0.1 * rng.standard_normal(x.shape[0]))
        u = rh.l if math.isfinite(float(rh.value)) else u
