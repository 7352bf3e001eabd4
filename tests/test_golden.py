"""Frozen golden-trajectory parity (VERDICT r3 item 6).

The live oracle tests (test_parity_oracle, test_oracle_bilevel) re-execute
the oracle at test time, so the oracle and the production solver could
drift *together* without failing.  Here BOTH are compared against the
committed ``tests/golden/*.json`` files (regenerated only deliberately via
``python tests/make_golden.py``): a drift in either implementation fails a
test without the other moving — a third, frozen reading of the reference
semantics (``/root/reference/src/ileqg.jl:341-488``,
``cross_entropy_bilevel_optimization.jl:252-415``,
``nelder_mead_bilevel_optimization.jl:174-352``).

Tolerances: oracle vs frozen is a deterministic float64 replay → 1e-12;
production vs frozen inherits the live parity tolerances (control MSE
< 1e-10, value rtol 1e-8) plus headroom on the bilevel chains, whose inner
values come from an independent solver implementation.
"""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import (CrossEntropyConfig, ILEQGConfig, NelderMeadConfig,
                         ileqg_solve)
from ratilqr_tpu.solvers import nelder_mead, ratilqr

from make_golden import (BILEVEL_INNER_ITER_MAX, CE_SCENARIO, CE_Z,
                         GOLDEN_DIR, ILEQG_CASES, ILEQG_ITER_MAX,
                         NM_SCENARIO, _make_problem, bilevel_fixture,
                         ce_draw_eager, oracle_value_fn)
from oracle import oracle_solve

IDS = [c[0] for c in ILEQG_CASES]


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


# --- iLEQG fixtures ---------------------------------------------------------

@pytest.mark.parametrize("case", ILEQG_CASES, ids=IDS)
def test_oracle_matches_frozen(case):
    name, spec, x0, u0, theta = case
    g = _load(f"ileqg_{name}.json")
    prob = _make_problem(spec)
    x, l, L, value, hist = oracle_solve(prob, x0, u0, theta,
                                        iter_max=ILEQG_ITER_MAX)
    np.testing.assert_allclose(x, np.asarray(g["x"]), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(l, np.asarray(g["l"]), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(L, np.asarray(g["L"]), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(value, g["value"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(g["eps_history"]),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("case", ILEQG_CASES, ids=IDS)
def test_solver_matches_frozen(case):
    name, spec, x0, u0, theta = case
    g = _load(f"ileqg_{name}.json")
    prob = _make_problem(spec)
    res = ileqg_solve(prob, ILEQGConfig(iter_max=ILEQG_ITER_MAX),
                      jnp.asarray(x0), jnp.asarray(u0), theta)
    assert not bool(res.failed)
    l_g = np.asarray(g["l"])
    mse_l = float(np.mean((np.asarray(res.l) - l_g) ** 2))
    assert mse_l < 1e-10, f"control MSE vs frozen: {mse_l}"
    np.testing.assert_allclose(float(res.value), g["value"], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g["x"]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.L), np.asarray(g["L"]),
                               rtol=1e-6, atol=1e-8)
    hist_g = np.asarray(g["eps_history"])
    hist = np.asarray(res.eps_history)[:int(res.eps_count)]
    assert len(hist) == len(hist_g)
    np.testing.assert_allclose(hist, hist_g, rtol=1e-6, atol=1e-8)


# --- NM (RAT iLQR++) warm chain ---------------------------------------------

def _assert_nm_state(st_get, frozen, rtol_c):
    np.testing.assert_allclose(st_get("theta_high_init"),
                               frozen["theta_high_init"], rtol=1e-9)
    np.testing.assert_allclose(st_get("theta_low_init"),
                               frozen["theta_low_init"], rtol=1e-12)
    np.testing.assert_allclose(st_get("theta_high"), frozen["theta_high"],
                               rtol=1e-9)
    np.testing.assert_allclose(st_get("theta_low"), frozen["theta_low"],
                               rtol=1e-9)
    np.testing.assert_allclose(st_get("c_high"), frozen["c_high"],
                               rtol=rtol_c)
    np.testing.assert_allclose(st_get("c_low"), frozen["c_low"],
                               rtol=rtol_c)
    assert int(st_get("iter_current")) == frozen["iter_current"]


def test_nm_oracle_matches_frozen():
    from oracle_bilevel import oracle_nm_solve
    g = _load("bilevel_nm_warm_chain.json")
    sc = g["scenario"]
    prob, x0, u0 = bilevel_fixture()
    state = {"theta_high_init": sc["theta_high_init"],
             "theta_low_init": sc["theta_low_init"],
             "theta_high": sc["theta_high_init"],
             "theta_low": sc["theta_low_init"],
             "c_high": None, "c_low": None, "iter_current": 0}
    for call in g["calls"]:
        xk = x0 + sc["x_shift"] * call["k"]
        th, c = oracle_nm_solve(oracle_value_fn(prob, xk, u0),
                                kl_bound=sc["kl_bound"], state=state,
                                iter_max=sc["iter_max"])
        np.testing.assert_allclose(th, call["theta_opt"], rtol=1e-12)
        np.testing.assert_allclose(c, call["value"], rtol=1e-12)
        _assert_nm_state(lambda k: state[k], call["state"], rtol_c=1e-12)


def test_nm_solver_matches_frozen():
    g = _load("bilevel_nm_warm_chain.json")
    sc = g["scenario"]
    prob, x0, u0 = bilevel_fixture()
    cfg = NelderMeadConfig(
        theta_high_init=sc["theta_high_init"],
        theta_low_init=sc["theta_low_init"], iter_max=sc["iter_max"],
        ileqg=ILEQGConfig(iter_max=BILEVEL_INNER_ITER_MAX))
    st = nelder_mead.init_state(cfg)
    x0j = jnp.asarray(x0)
    u0j = jnp.asarray(u0)
    for call in g["calls"]:
        res = nelder_mead.solve(prob, cfg, st,
                                x0j + sc["x_shift"] * call["k"], u0j,
                                kl_bound=sc["kl_bound"])
        st = res.state
        np.testing.assert_allclose(float(res.theta_opt), call["theta_opt"],
                                   rtol=1e-9)
        np.testing.assert_allclose(float(res.value), call["value"],
                                   rtol=1e-7)
        _assert_nm_state(lambda k: float(getattr(st, k)), call["state"],
                         rtol_c=1e-7)


# --- CE (RAT iLQR) warm chain -----------------------------------------------

def test_ce_oracle_matches_frozen():
    from oracle_bilevel import oracle_ce_solve
    g = _load("bilevel_ce_warm_chain.json")
    sc = g["scenario"]
    np.testing.assert_allclose(np.asarray(g["z"]),
                               CE_Z.tolist())  # sampler pinned too
    prob, x0, u0 = bilevel_fixture()
    state = {"mu_init": sc["mu_init"], "sigma_init": sc["sigma_init"],
             "mu": sc["mu_init"], "sigma": sc["sigma_init"],
             "theta_min": math.inf, "theta_max": 0.0, "iter_current": 0}
    for call in g["calls"]:
        xk = x0 + sc["x_shift"] * call["k"]
        th, c, retries = oracle_ce_solve(
            oracle_value_fn(prob, xk, u0), ce_draw_eager(sc["num_samples"]),
            kl_bound=sc["kl_bound"], state=state,
            num_samples=sc["num_samples"], num_elite=sc["num_elite"],
            iter_max=sc["iter_max"], lam=sc["lam"])
        np.testing.assert_allclose(th, call["theta_opt"], rtol=1e-12)
        np.testing.assert_allclose(c, call["value"], rtol=1e-12)
        assert retries == call["final_retries"]
        for key, frozen_v in call["state"].items():
            got = state[key]
            if frozen_v is None:        # inf encoded as null in JSON
                assert math.isinf(got), key
            elif key == "iter_current":
                assert int(got) == frozen_v
            else:
                np.testing.assert_allclose(got, frozen_v, rtol=1e-12,
                                           err_msg=key)


def test_ce_solver_matches_frozen(monkeypatch):
    g = _load("bilevel_ce_warm_chain.json")
    sc = g["scenario"]
    prob, x0, u0 = bilevel_fixture()

    def fake_draw(key, mu, sigma, num_samples, dtype=jnp.float64):
        z = jnp.asarray(CE_Z[:num_samples], dtype)
        return jnp.abs(jnp.asarray(mu, dtype)
                       + jnp.asarray(sigma, dtype) * z
                       ) + jnp.asarray(1e-4, dtype)

    monkeypatch.setattr(ratilqr, "get_positive_samples", fake_draw)
    ratilqr.make_cost_fn.cache_clear()
    try:
        cfg = CrossEntropyConfig(
            num_samples=sc["num_samples"], num_elite=sc["num_elite"],
            iter_max=sc["iter_max"], lam=sc["lam"], mu_init=sc["mu_init"],
            sigma_init=sc["sigma_init"],
            ileqg=ILEQGConfig(iter_max=BILEVEL_INNER_ITER_MAX))
        st = ratilqr.init_state(cfg)
        x0j = jnp.asarray(x0)
        u0j = jnp.asarray(u0)
        for call in g["calls"]:
            res = ratilqr.solve(prob, cfg, st,
                                x0j + sc["x_shift"] * call["k"], u0j,
                                jax.random.key(0), kl_bound=sc["kl_bound"])
            st = res.state
            # θ decisions depend only on the injected draws + branch logic
            # → tight; values route through the independent inner solver.
            np.testing.assert_allclose(float(res.theta_opt),
                                       call["theta_opt"], rtol=1e-9)
            np.testing.assert_allclose(float(res.value), call["value"],
                                       rtol=1e-6)
            frozen = call["state"]
            for key in ("mu_init", "sigma_init", "mu", "sigma",
                        "theta_min", "theta_max"):
                frozen_v = frozen[key]
                got = float(getattr(st, key))
                if frozen_v is None:
                    assert math.isinf(got), key
                else:
                    np.testing.assert_allclose(got, frozen_v, rtol=1e-9,
                                               err_msg=key)
    finally:
        ratilqr.make_cost_fn.cache_clear()  # drop the fake-sampler bank
