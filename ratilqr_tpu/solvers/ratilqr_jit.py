"""Fully-jitted RAT iLQR: the whole CE bilevel solve as ONE device program.

The host-orchestrated path (``ratilqr_tpu.solvers.ratilqr``) mirrors the
reference's master-process control flow and costs one device dispatch per
CE generation — fine for throughput, but each host↔device round trip adds
latency that dominates real-time MPC steps.  This module compiles the
*entire* ``solve!`` (``cross_entropy_bilevel_optimization.jl:364-415``) —
sampling, the data-dependent redraw loop, elite refit, θ_min/θ_max
bookkeeping, the final re-solve with θ-backoff — into a single jitted
function: one dispatch per MPC re-plan.

Every data-dependent construct of the reference becomes a lax primitive:
  - CE generations            → ``lax.while_loop`` over iter_max (ref :371)
  - feasibility redraw loop   → inner ``lax.while_loop`` (ref :265-312)
  - rejection sampling of θ>0 → truncated-normal draw (static shape)
  - θ_min/θ_max if/elseif     → tiny ``lax.scan`` preserving sample order
                                (ref :314-324)
  - final-solve backoff retry → bounded ``lax.while_loop`` (ref :390-414)
Exceptions are already masks at the iLEQG level (value=Inf lanes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.config import CrossEntropyConfig
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve
from ratilqr_tpu.solvers.ileqg import solve_via_bank
from ratilqr_tpu.solvers.ratilqr import (CEState, RATiLQRResult,
                                         get_positive_samples)

Array = jnp.ndarray

_MAX_REDRAWS = 25        # feasibility redraw bound (μ_init shrinks by λ each
                         # round: 25 halvings spans 7 orders of magnitude)
_MAX_FINAL_RETRIES = 25  # θ-backoff bound for the final re-solve; the LAST
                         # retry forces θ = 0 (the reference's unbounded loop
                         # terminates there for any well-posed problem)


@partial(jax.jit, static_argnums=(0, 1))
def solve(problem: RiskSensitiveProblem, config: CrossEntropyConfig,
          state: CEState, x0: Array, u_init: Array, key: Array,
          kl_bound: Array) -> RATiLQRResult:
    """Single-dispatch RAT iLQR ``solve!``.

    Unlike the host path, ``kl_bound`` is traced; ``kl_bound == 0`` follows
    the pure-iLQG branch (ref :386-389) via masking.  Returns the same
    :class:`RATiLQRResult` (with the updated warm-start :class:`CEState`).
    """
    dtype = x0.dtype
    kl_bound = jnp.asarray(kl_bound, dtype)
    ns, ne = config.num_samples, config.num_elite
    lam = jnp.asarray(config.lam, dtype)
    threshold = max(config.num_elite, config.num_samples * config.lam)

    def bank_costs(thetas):
        res = jax.vmap(lambda th: ileqg_solve(problem, config.ileqg, x0,
                                              u_init, th))(thetas)
        cost = res.value + kl_bound / thetas
        # NaN objective = failed solve → Inf (Inf-masking invariant).
        # Critically, top_k(-cost) below would rank NaN FIRST (elite!)
        # while the host path's argsort ranks it last.
        return jnp.where(jnp.isnan(cost), jnp.asarray(jnp.inf, dtype),
                         cost)

    # initialize! (ref :133-138)
    mu_init0, sigma_init0 = state.mu_init, state.sigma_init
    ce0 = dict(mu_init=mu_init0, sigma_init=sigma_init0,
               mu=mu_init0, sigma=sigma_init0,
               theta_min=jnp.asarray(jnp.inf, dtype),
               theta_max=jnp.asarray(0.0, dtype))

    def generation(carry):
        (it, key, mu_init, sigma_init, mu, sigma, tmin, tmax,
         exhausted) = carry
        it = it + 1

        def redraw_cond(rc):
            done = rc[-1]
            return ~done & (rc[0] < _MAX_REDRAWS)

        def redraw_body(rc):
            (k_draw, key, mu_init, sigma_init, _, _, done) = (
                rc[0], rc[1], rc[2], rc[3], rc[4], rc[5], rc[6])
            key, sub = jax.random.split(key)
            mu_s = jnp.where(it == 1, mu_init, mu)
            sigma_s = jnp.where(it == 1, sigma_init, sigma)
            thetas = get_positive_samples(sub, mu_s, sigma_s, ns, dtype)
            costs = bank_costs(thetas)
            num_valid = jnp.sum(jnp.isfinite(costs))
            # iteration-1 feasibility adaptation (ref :293-305)
            shrink = (it == 1) & (num_valid < threshold)
            grow = (it == 1) & (num_valid == ns)
            mu_init = jnp.where(shrink, mu_init * lam,
                                jnp.where(grow, mu_init / lam, mu_init))
            sigma_init = jnp.where(shrink, sigma_init * lam,
                                   jnp.where(grow, sigma_init / lam,
                                             sigma_init))
            done = grow | (num_valid >= threshold)
            return (k_draw + 1, key, mu_init, sigma_init, thetas, costs,
                    done)

        rc = (jnp.zeros((), jnp.int32), key, mu_init, sigma_init,
              jnp.zeros((ns,), dtype), jnp.full((ns,), jnp.inf, dtype),
              jnp.zeros((), bool))
        (_, key, mu_init, sigma_init, thetas, costs, done) = lax.while_loop(
            redraw_cond, redraw_body, rc)
        # Budget exhaustion: the host path (and reference) would keep
        # redrawing; here the generation proceeds with the partly-Inf sample
        # set and the condition is surfaced via RATiLQRResult (ADVICE r1).
        exhausted = exhausted | ~done

        # θ_min/θ_max bookkeeping with the reference's exact if/elseif
        # order over samples (ref :314-324).
        def track(mm, tc):
            th, c = tc
            tmin, tmax = mm
            valid = jnp.isfinite(c)
            is_min = valid & (th < tmin)
            is_max = valid & ~is_min & (th > tmax)
            return (jnp.where(is_min, th, tmin),
                    jnp.where(is_max, th, tmax)), None
        (tmin, tmax), _ = lax.scan(track, (tmin, tmax), (thetas, costs))

        # Elite refit with the ML (biased) σ estimator (ref :326-334).
        # Tie-breaking parity: lax.top_k documents lower-index-first order
        # for equal values — the same elite set as the host path's stable
        # argsort (ratilqr.py step(); ref sort at :327-329).  Pinned by
        # tests/test_bilevel.py::test_elite_tie_break_matches_host.
        neg_costs, idx = lax.top_k(-costs, ne)
        elite = thetas[idx]
        mu_new = jnp.sum(elite) / ne
        sigma_new = jnp.sqrt(jnp.sum((elite - mu_new) ** 2) / ne)
        if config.verbose:
            # Per-generation trace mirroring the reference's verbose prints
            # (ref :260-309), emitted from inside the compiled program.
            jax.debug.print(
                "**CE gen {i}: {v}/{n} valid, best_cost={b:.4g} "
                "mu={m:.4g} sigma={s:.4g}",
                i=it, v=jnp.sum(jnp.isfinite(costs)), n=ns,
                b=-neg_costs[0], m=mu_new, s=sigma_new)
        return (it, key, mu_init, sigma_init, mu_new, sigma_new, tmin, tmax,
                exhausted)

    def run_ce(operand):
        key = operand
        carry = (jnp.zeros((), jnp.int32), key, ce0["mu_init"],
                 ce0["sigma_init"], ce0["mu"], ce0["sigma"],
                 ce0["theta_min"], ce0["theta_max"], jnp.zeros((), bool))
        carry = lax.while_loop(lambda c: c[0] < config.iter_max, generation,
                               carry)
        (_, _, mu_init, sigma_init, mu, sigma, tmin, tmax,
         exhausted) = carry
        theta_opt = jnp.where(config.use_theta_max, tmax, mu)
        return (mu_init, sigma_init, mu, sigma, tmin, tmax, theta_opt,
                exhausted)

    def skip_ce(operand):
        # kl_bound == 0 → pure iLQG (ref :386-389); CE state untouched
        # (the STATE keeps the initialize!-reset θ-range; the RETURNED
        # range is the reference's literal (0.0, 0.0), ref :408 — applied
        # at the result construction below).
        return (ce0["mu_init"], ce0["sigma_init"], ce0["mu"], ce0["sigma"],
                ce0["theta_min"], ce0["theta_max"],
                jnp.asarray(0.0, dtype), jnp.zeros((), bool))

    (mu_init, sigma_init, mu, sigma, tmin, tmax, theta_opt,
     exhausted) = lax.cond(kl_bound > 0, run_ce, skip_ce, key)

    # Final full re-solve with θ-backoff on neurotic breakdown (ref
    # :390-414): bounded while_loop carrying the full result pytree.
    # Routed through a 1-lane bank → Pallas DP kernel on TPU
    # (solve_via_bank, ~3x faster than the unbatched scan path).
    res0 = solve_via_bank(problem, config.ileqg, x0, u_init, theta_opt)

    def retry_cond(carry):
        k, th, res = carry
        return res.failed & (k < _MAX_FINAL_RETRIES)

    def retry_body(carry):
        k, th, _ = carry
        th = jnp.maximum(jnp.asarray(0.0, dtype), th - sigma)
        # Last budgeted retry: force the reference's terminal θ = 0
        # attempt (its unbounded loop always reaches it — and with a
        # collapsed σ == 0 the decrement alone never would).
        th = jnp.where(k + 1 >= _MAX_FINAL_RETRIES,
                       jnp.asarray(0.0, dtype), th)
        res = solve_via_bank(problem, config.ileqg, x0, u_init, th)
        return (k + 1, th, res)

    _, theta_opt, res = lax.while_loop(
        retry_cond, retry_body, (jnp.zeros((), jnp.int32), theta_opt, res0))

    value = jnp.where(kl_bound > 0, res.value + kl_bound / theta_opt,
                      res.value)
    new_state = CEState(
        mu_init=mu_init, sigma_init=sigma_init, mu=mu, sigma=sigma,
        theta_min=tmin, theta_max=tmax,
        # 0 when the CE search never ran (kl_bound == 0), matching the
        # host path's initialize!-only semantics.
        iter_current=jnp.where(kl_bound > 0, config.iter_max, 0))
    # Returned θ-range: the reference's kl_bound == 0 branch returns the
    # literal (0.0, 0.0) (ref :408); the state keeps its reset fields.
    zero = jnp.asarray(0.0, dtype)
    return RATiLQRResult(theta_opt=theta_opt, x=res.x, l=res.l, L=res.L,
                         value=value,
                         theta_min=jnp.where(kl_bound > 0, tmin, zero),
                         theta_max=jnp.where(kl_bound > 0, tmax, zero),
                         state=new_state, redraws_exhausted=exhausted,
                         final_failed=res.failed)
