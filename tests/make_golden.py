"""Regenerate the frozen golden parity trajectories (tests/golden/*.json).

VERDICT r3 item 6: the oracle (tests/oracle.py) is re-executed at test
time, so the oracle and the production solver could drift *together*
without any test failing.  This script freezes the f64 oracle outputs —
controls, gains, trajectories, values, ε-histories for the 6 iLEQG parity
fixtures, and the full decision record of 2 bilevel warm-chain scenarios —
as versioned JSON.  ``tests/test_golden.py`` then compares BOTH the oracle
AND the production solver against the frozen files: a drift in either
fails a test without the other moving, pinning the reference semantics
(``/root/reference/src/ileqg.jl:341-488``,
``cross_entropy_bilevel_optimization.jl:252-415``,
``nelder_mead_bilevel_optimization.jl:174-352``) against a third, frozen
reading.

Run from the repo root (CPU, float64):

    python tests/make_golden.py

Commit the resulting ``tests/golden/*.json`` only together with a reasoned
change to the oracle: regenerating to make a failing test pass defeats the
freeze.
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")

# ---------------------------------------------------------------------------
# Shared fixture definitions.  test_golden.py imports these so the frozen
# files and the tests can never disagree about what was frozen.

ILEQG_ITER_MAX = 20

# (name, problem factory kwargs handled in _make_problem, x0, u0, theta) —
# the same 6 fixtures as tests/test_parity_oracle.py CASES.
ILEQG_CASES = [
    ("lqr_theta0", ("lqr_problem", dict(N=10)), np.zeros(2),
     np.ones((10, 2)), 0.0),
    ("lqr_risk", ("lqr_problem", dict(N=10, noise=0.01)), np.zeros(2),
     np.ones((10, 2)), 0.3),
    ("nonlinear_theta0", ("nonlinear_toy", dict(N=10)), np.zeros(2),
     0.1 * np.ones((10, 2)), 0.0),
    ("nonlinear_risk", ("nonlinear_toy", dict(N=10)), np.zeros(2),
     0.1 * np.ones((10, 2)), 0.5),
    ("unicycle", ("unicycle", dict(N=20)), np.zeros(3),
     0.05 * np.ones((20, 2)), 0.01),
    ("integrator_adaptive", ("double_integrator", dict(N=10, noise=0.01)),
     np.array([1.0, -2.0]), np.zeros((10, 2)), 0.1),
]

# Bilevel scenarios: warm chains over shifted states (the MPC pattern that
# exercises the cross-solve state mutation).  Inner iLEQG budget is capped
# so the eager oracle stays tractable.
BILEVEL_INNER_ITER_MAX = 20
NM_SCENARIO = dict(theta_high_init=500.0, theta_low_init=1e-8, iter_max=6,
                   kl_bound=1.0, n_calls=3, x_shift=0.05)
CE_SCENARIO = dict(num_samples=4, num_elite=2, iter_max=3, lam=0.5,
                   mu_init=0.1, sigma_init=0.05, kl_bound=1.0, n_calls=2,
                   x_shift=0.05)
# Deterministic stand-in for the CE θ-sampler's N(0,1) draws (the same
# replayable-sequence device as tests/test_oracle_bilevel.py).
CE_Z = np.linspace(-1.1, 1.3, 7)


def _make_problem(spec):
    from ratilqr_tpu import models
    name, kwargs = spec
    return getattr(models, name)(**kwargs)


def bilevel_fixture():
    from ratilqr_tpu.models import nonlinear_toy
    prob = nonlinear_toy(N=10)
    x0 = np.zeros(2)
    u0 = 0.1 * np.ones((10, 2))
    return prob, x0, u0


def ce_draw_eager(num_samples, mu_init_like=None):
    def draw(mu, sigma):
        return [abs(mu + sigma * z) + 1e-4 for z in CE_Z[:num_samples]]
    return draw


def oracle_value_fn(prob, x, u0):
    """Pure-oracle inner value: ``theta -> iLEQG value`` with the oracle's
    exception semantics mapped to Inf (the bilevel catch-to-Inf)."""
    from oracle import NeuroticBreakdown, oracle_solve

    def value(th):
        try:
            return float(oracle_solve(prob, x, u0, float(th),
                                      iter_max=BILEVEL_INNER_ITER_MAX)[3])
        except NeuroticBreakdown:
            return math.inf
    return value


# ---------------------------------------------------------------------------


def _freeze_ileqg():
    from oracle import oracle_solve
    for name, spec, x0, u0, theta in ILEQG_CASES:
        prob = _make_problem(spec)
        x, l, L, value, hist = oracle_solve(prob, x0, u0, theta,
                                            iter_max=ILEQG_ITER_MAX)
        out = {
            "fixture": name,
            "iter_max": ILEQG_ITER_MAX,
            "theta": theta,
            "x0": np.asarray(x0).tolist(),
            "u0": np.asarray(u0).tolist(),
            "x": np.asarray(x).tolist(),
            "l": np.asarray(l).tolist(),
            "L": np.asarray(L).tolist(),
            "value": float(value),
            "eps_history": [[float(e), float(d)] for e, d in hist],
        }
        path = os.path.join(GOLDEN_DIR, f"ileqg_{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}: value={value:.12g}, "
              f"{len(hist)} line-search trials")


def _freeze_nm():
    from oracle_bilevel import oracle_nm_solve
    prob, x0, u0 = bilevel_fixture()
    sc = NM_SCENARIO
    state = {"theta_high_init": sc["theta_high_init"],
             "theta_low_init": sc["theta_low_init"],
             "theta_high": sc["theta_high_init"],
             "theta_low": sc["theta_low_init"],
             "c_high": None, "c_low": None, "iter_current": 0}
    calls = []
    for k in range(sc["n_calls"]):
        xk = x0 + sc["x_shift"] * k
        th, c = oracle_nm_solve(oracle_value_fn(prob, xk, u0),
                                kl_bound=sc["kl_bound"], state=state,
                                iter_max=sc["iter_max"])
        calls.append({"k": k, "theta_opt": th, "value": c,
                      "state": dict(state)})
        print(f"NM call {k}: theta_opt={th:.12g} value={c:.12g} "
              f"iters={state['iter_current']}")
    path = os.path.join(GOLDEN_DIR, "bilevel_nm_warm_chain.json")
    with open(path, "w") as f:
        json.dump({"scenario": sc, "calls": calls}, f, indent=1)
    print(f"wrote {path}")


def _freeze_ce():
    from oracle_bilevel import oracle_ce_solve
    prob, x0, u0 = bilevel_fixture()
    sc = CE_SCENARIO
    state = {"mu_init": sc["mu_init"], "sigma_init": sc["sigma_init"],
             "mu": sc["mu_init"], "sigma": sc["sigma_init"],
             "theta_min": math.inf, "theta_max": 0.0, "iter_current": 0}
    calls = []
    for k in range(sc["n_calls"]):
        xk = x0 + sc["x_shift"] * k
        th, c, retries = oracle_ce_solve(
            oracle_value_fn(prob, xk, u0), ce_draw_eager(sc["num_samples"]),
            kl_bound=sc["kl_bound"], state=state,
            num_samples=sc["num_samples"], num_elite=sc["num_elite"],
            iter_max=sc["iter_max"], lam=sc["lam"])
        frozen_state = {key: (None if isinstance(v, float) and math.isinf(v)
                              else v) for key, v in state.items()}
        calls.append({"k": k, "theta_opt": th, "value": c,
                      "final_retries": retries, "state": frozen_state})
        print(f"CE call {k}: theta_opt={th:.12g} value={c:.12g}")
    path = os.path.join(GOLDEN_DIR, "bilevel_ce_warm_chain.json")
    with open(path, "w") as f:
        json.dump({"scenario": sc, "z": CE_Z.tolist(), "calls": calls},
                  f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _freeze_ileqg()
    _freeze_nm()
    _freeze_ce()
