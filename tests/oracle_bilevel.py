"""Independent eager-mode oracles for the BILEVEL outer loops (CE and NM),
mirroring the reference's control flow statement-for-statement.

``tests/oracle.py`` pins the inner iLEQG solve; these oracles pin the outer
``step!``/``solve!`` decision logic of
``/root/reference/src/cross_entropy_bilevel_optimization.jl`` (RAT iLQR)
and ``/root/reference/src/nelder_mead_bilevel_optimization.jl``
(RAT iLQR++) against a SECOND reading of the Julia — plain Python loops and
mutable dict state, no lax primitives, no masking (VERDICT r2 item 3: the
host and jit paths were both written from one reading; nothing in the repo
independently re-derived the outer loops).

Isolation contract: the *inner* value function is injected (``value_fn``),
so the oracle and the production paths consume bit-identical inner costs
and any disagreement is an outer-loop logic divergence, not numerics.  The
CE θ-sampler is injected too (``draw_fn(mu, sigma) -> sequence of positive
floats``): tests plug the same deterministic sampler into the oracle, the
host path and the jitted path, making the reference's rejection-sampled
randomness (``cross_entropy_bilevel_optimization.jl:233-246``) a replayable
sequence.
"""
from __future__ import annotations

import math


def oracle_ce_solve(value_fn, draw_fn, *, kl_bound, state, num_samples=10,
                    num_elite=3, iter_max=5, lam=0.5, use_theta_max=False,
                    max_redraws=1000):
    """Mirror of CE ``solve!`` (ref :364-415) + ``step!`` (ref :252-335)
    + ``initialize!`` (ref :133-138).

    Args:
      value_fn: ``theta -> ileqg value`` (math.inf on neurotic breakdown —
        the reference's catch-to-Inf, ref :161-166).
      draw_fn: ``(mu, sigma) -> list of num_samples positive floats`` —
        stands in for ``get_positive_samples`` (ref :233-246).
      state: mutable dict with keys ``mu_init, sigma_init, mu, sigma,
        theta_min, theta_max, iter_current`` (the solver struct's mutable
        fields, ref :90-97); mutated in place exactly as the reference
        mutates the struct across ``solve!`` calls (ref :66-68).
      max_redraws: safety bound replacing the reference's unbounded redraw
        loop (a test that hits it is a broken fixture, not parity).

    Returns ``(theta_opt, cost_at_theta_opt, n_final_retries)`` where the
    cost includes the ``+ kl_bound/theta`` outer term (ref :406).
    """
    assert kl_bound >= 0
    # initialize! (ref :133-138)
    state["iter_current"] = 0
    state["mu"], state["sigma"] = state["mu_init"], state["sigma_init"]
    state["theta_max"], state["theta_min"] = 0.0, math.inf

    def cost_of(th):
        v = value_fn(th) + kl_bound / th
        return math.inf if math.isnan(v) else v

    if kl_bound > 0:
        while state["iter_current"] < iter_max:
            # --- step! (ref :252-335) --------------------------------
            state["iter_current"] += 1
            it = state["iter_current"]
            thetas, costs = [], []
            for _ in range(max_redraws):
                if it == 1:
                    thetas = list(draw_fn(state["mu_init"],
                                          state["sigma_init"]))
                else:
                    thetas = list(draw_fn(state["mu"], state["sigma"]))
                assert len(thetas) == num_samples and min(thetas) > 0
                costs = [cost_of(th) for th in thetas]
                num_valid = num_samples - sum(math.isinf(c) for c in costs)
                # iteration-1 feasibility adaptation; note the exact
                # if/elseif order (ref :293-311): the "all valid" branch is
                # checked BEFORE the generic enough-valid break, and both
                # rescales persist to the next solve!.
                if (it == 1
                        and num_valid < max(num_elite, num_samples * lam)):
                    state["mu_init"] *= lam
                    state["sigma_init"] *= lam
                elif it == 1 and num_valid == num_samples:
                    state["mu_init"] /= lam
                    state["sigma_init"] /= lam
                    break
                elif num_valid >= max(num_elite, num_samples * lam):
                    break
            else:
                raise RuntimeError("oracle redraw budget exhausted")

            # θ_min/θ_max bookkeeping, exact if/elseif order over samples
            # (ref :314-324): a sample that sets θ_min cannot also set
            # θ_max in the same pass.
            for th, c in zip(thetas, costs):
                if math.isinf(c):
                    continue
                if th < state["theta_min"]:
                    state["theta_min"] = th
                elif th > state["theta_max"]:
                    state["theta_max"] = th

            # Elite refit with the ML (biased) σ estimator (ref :326-334);
            # Julia's sort is stable, so ties keep draw order.
            order = sorted(range(num_samples), key=lambda i: costs[i])
            elite = [thetas[i] for i in order[:num_elite]]
            mu_new = sum(elite) / num_elite
            sigma_new = math.sqrt(
                sum((th - mu_new) ** 2 for th in elite) / num_elite)
            state["mu"], state["sigma"] = mu_new, sigma_new
            # --- end step! -------------------------------------------
        theta_opt = (state["theta_max"] if use_theta_max else state["mu"])
    else:
        theta_opt = 0.0  # pure iLQG (ref :386-389)

    # Final re-solve with θ-backoff on breakdown (ref :390-414).
    retries = 0
    while True:
        value = value_fn(theta_opt)
        if math.isfinite(value):
            if kl_bound > 0:
                return theta_opt, value + kl_bound / theta_opt, retries
            return theta_opt, value, retries
        theta_opt = max(0.0, theta_opt - state["sigma"])
        retries += 1
        if retries > 1000:
            raise RuntimeError("oracle final-retry budget exhausted")


def oracle_nm_solve(value_fn, *, kl_bound, state, alpha=1.0, beta=2.0,
                    gamma=0.5, eps=1e-2, lam=0.5, iter_max=100,
                    max_bootstrap=1000):
    """Mirror of NM ``solve!`` (ref :276-352) + ``step!`` (ref :174-252)
    + ``initialize!`` (ref :164-168).

    ``state`` is a mutable dict with keys ``theta_high_init,
    theta_low_init, theta_high, theta_low, c_high, c_low, iter_current``;
    ``c_high``/``c_low`` start as ``None`` and PERSIST across calls — the
    reference's cross-solve ``isnothing`` quirk (ref :283,294): a second
    ``solve!`` skips the feasibility bootstrap and iterates on the carried
    (stale) costs attached to the re-initialized θ vertices.

    Returns ``(theta_opt, cost_at_theta_opt)``.
    """
    assert kl_bound >= 0

    def cost_of(th):
        v = value_fn(th) + kl_bound / th
        return math.inf if math.isnan(v) else v

    # initialize! (ref :164-168): θ reset from inits, c NOT touched.
    state["iter_current"] = 0
    state["theta_low"] = state["theta_low_init"]
    state["theta_high"] = state["theta_high_init"]

    if kl_bound > 0:
        # Feasibility bootstrap (ref :283-304): halve θ (and its init!)
        # until the cost is finite; skipped for carried c.
        if state["c_high"] is None:
            for _ in range(max_bootstrap):
                state["c_high"] = cost_of(state["theta_high"])
                if not math.isinf(state["c_high"]):
                    break
                state["theta_high"] *= lam
                state["theta_high_init"] *= lam
        if state["c_low"] is None:
            for _ in range(max_bootstrap):
                state["c_low"] = cost_of(state["theta_low"])
                if not math.isinf(state["c_low"]):
                    break
                state["theta_low"] *= lam
                state["theta_low_init"] *= lam

        while True:
            # --- step! (ref :174-252) --------------------------------
            state["iter_current"] += 1
            if state["c_high"] < state["c_low"]:
                state["theta_low"], state["theta_high"] = (
                    state["theta_high"], state["theta_low"])
                state["c_low"], state["c_high"] = (state["c_high"],
                                                   state["c_low"])
            theta_m = state["theta_low"]
            # reflection, clamped below by θ_low_init (ref :195-196)
            theta_r = max(state["theta_low_init"],
                          theta_m + alpha * (theta_m - state["theta_high"]))
            c_r = cost_of(theta_r)
            if c_r < state["c_low"]:
                # expansion (ref :202-222)
                theta_e = max(state["theta_low_init"],
                              theta_m + beta * (theta_r - theta_m))
                c_e = cost_of(theta_e)
                if c_e < c_r:
                    state["theta_high"], state["c_high"] = theta_e, c_e
                else:
                    state["theta_high"], state["c_high"] = theta_r, c_r
            else:
                # keep the reflection point if it beats c_high — note this
                # updates θ_high BEFORE the contraction uses it (ref
                # :227-234).
                if c_r < state["c_high"]:
                    state["theta_high"], state["c_high"] = theta_r, c_r
                theta_c = max(state["theta_low_init"],
                              theta_m + gamma * (state["theta_high"]
                                                 - theta_m))
                c_c = cost_of(theta_c)
                if c_c > state["c_high"]:
                    # shrink: midpoint is NOT clamped (ref :239-240)
                    state["theta_high"] = (state["theta_high"]
                                           + state["theta_low"]) / 2
                    state["c_high"] = cost_of(state["theta_high"])
                else:
                    state["theta_high"], state["c_high"] = theta_c, c_c
            # --- end step! -------------------------------------------
            c_mean = (state["c_low"] + state["c_high"]) / 2
            stdev = math.sqrt(0.5 * ((state["c_high"] - c_mean) ** 2
                                     + (state["c_low"] - c_mean) ** 2))
            if stdev < eps:
                break
            if state["iter_current"] >= iter_max:
                break
        theta_opt = state["theta_low"]
    else:
        theta_opt = 0.0

    # Final re-solve — deliberately NO retry loop (ref :334-346, unlike CE).
    value = value_fn(theta_opt)
    if kl_bound > 0:
        return theta_opt, value + kl_bound / theta_opt
    return theta_opt, value
