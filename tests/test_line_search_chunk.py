"""Exact-parity pins for the line-search execution strategies.

The backtracking line search (``ileqg.jl:494-592``) has three
TPU-motivated execution variants that must be *indistinguishable* from the
sequential reference semantics:

- scalar-only while-loop carry with post-loop re-materialization of the
  accepted candidate (always on);
- ``ls_chunk > 1``: the ε-ladder evaluated as one batched pass per round,
  first acceptable candidate committed;
- ``eps_history_cap = 0``: diagnostics buffer disabled.

These tests pin them against the ``ls_chunk=1`` path bit-for-bit in f64 —
same iteration counts, same trial counts, same ε-history entries, same
controls/gains/value.  A semantic drift in any variant (e.g. a candidate
evaluated past the first acceptance, or history recorded out of order)
fails exact equality here.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.models import nonlinear_toy, unicycle

CASES = [
    ("unicycle", lambda: unicycle(N=30), jnp.zeros(3),
     jnp.zeros((30, 2))),
    ("toy", lambda: nonlinear_toy(N=10), jnp.zeros(2),
     0.1 * jnp.ones((10, 2))),
]


@pytest.mark.parametrize("name,prob,x0,u0", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.parametrize("theta", [0.0, 0.01])
@pytest.mark.parametrize("adaptive", [False, True])
def test_chunked_ladder_matches_sequential(name, prob, x0, u0, theta,
                                           adaptive):
    problem = prob()
    base = ILEQGConfig(iter_max=25, adaptive_eps_init=adaptive)
    r1 = ileqg_solve(problem, base, x0, u0, theta)
    for chunk in (2, 4, 8):
        cfg = ILEQGConfig(iter_max=25, adaptive_eps_init=adaptive,
                          ls_chunk=chunk)
        r2 = ileqg_solve(problem, cfg, x0, u0, theta)
        assert int(r1.iterations) == int(r2.iterations)
        assert int(r1.eps_count) == int(r2.eps_count)
        assert bool(r1.failed) == bool(r2.failed)
        np.testing.assert_allclose(float(r2.value), float(r1.value),
                                   rtol=1e-13)
        np.testing.assert_allclose(np.asarray(r2.l), np.asarray(r1.l),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(r2.L), np.asarray(r1.L),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(r2.eps_history),
                                   np.asarray(r1.eps_history),
                                   rtol=1e-12, atol=1e-14)


def test_history_cap_zero_disables_recording_only():
    problem = unicycle(N=30)
    x0, u0 = jnp.zeros(3), jnp.zeros((30, 2))
    r1 = ileqg_solve(problem, ILEQGConfig(iter_max=25), x0, u0, 0.01)
    r0 = ileqg_solve(problem, ILEQGConfig(iter_max=25, eps_history_cap=0),
                     x0, u0, 0.01)
    assert r0.eps_history.shape == (0, 2)
    assert int(r0.eps_count) == int(r1.eps_count)
    assert int(r0.iterations) == int(r1.iterations)
    np.testing.assert_array_equal(np.asarray(r0.l), np.asarray(r1.l))
    np.testing.assert_array_equal(np.asarray(r0.L), np.asarray(r1.L))


def test_chunk_exceeding_trial_budget_respects_cap():
    # ls_max_trials smaller than one chunk: candidates beyond the budget
    # must not be taken, counted, or recorded.
    problem = unicycle(N=20)
    x0, u0 = jnp.zeros(3), jnp.zeros((20, 2))
    for trials in (3, 5):
        r1 = ileqg_solve(problem, ILEQGConfig(iter_max=10,
                                              ls_max_trials=trials),
                         x0, u0, 0.0)
        r2 = ileqg_solve(problem, ILEQGConfig(iter_max=10,
                                              ls_max_trials=trials,
                                              ls_chunk=8),
                         x0, u0, 0.0)
        assert int(r1.eps_count) == int(r2.eps_count)
        assert bool(r1.failed) == bool(r2.failed)
        np.testing.assert_array_equal(np.asarray(r2.l), np.asarray(r1.l))
