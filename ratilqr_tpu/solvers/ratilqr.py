"""RAT iLQR — Cross-Entropy bilevel optimization over the risk parameter θ.

TPU-native counterpart of ``CrossEntropyBilevelOptimizationSolver``
(``/root/reference/src/cross_entropy_bilevel_optimization.jl:70-415``).

The reference fans each θ-sample out to a Julia worker process, one full
iLEQG solve per ``remotecall_fetch`` (``…:180-192``).  Here the whole
generation is a single jitted ``vmap`` bank of iLEQG solves
(:func:`ratilqr_tpu.solvers.ileqg.make_batched_solver`): every lane runs
simultaneously on-chip, infeasible lanes surface as ``cost = Inf`` via the
branchless failure masks instead of the worker's catch-to-Inf (``…:161-166``).

The outer CE loop (sample → evaluate → elite refit) stays host-driven like
the reference's master process: it is O(iter_max)=5 cheap control decisions
around the heavy batched device call, and the data-dependent redraw logic
(``…:265-312``) stays exact.  ``solve`` threads an explicit
:class:`CEState` pytree — the functional replacement for the reference's
mutable ``μ_init``/``σ_init`` warm-start fields that persist across MPC
re-plans (``…:66-68,297-305``).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu.config import CrossEntropyConfig
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers.ileqg import (ILEQGResult, make_batched_solver,
                                       solve_via_bank)
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve

Array = jnp.ndarray


class CEState(NamedTuple):
    """Mutable CE solver state (``cross_entropy_bilevel_optimization.jl:84-98``)
    as an explicit pytree threaded through ``solve`` calls."""
    mu_init: Array     # adapts across solves (MPC warm start, ref :66-68)
    sigma_init: Array
    mu: Array
    sigma: Array
    theta_min: Array   # minimum feasible θ encountered
    theta_max: Array   # maximum feasible θ encountered
    iter_current: int


class RATiLQRResult(NamedTuple):
    """``solve!`` return values (``…:348-355``) plus the updated state.

    ``redraws_exhausted`` surfaces a CE generation whose feasibility redraw
    loop ran out of budget (the reference's loop at ``…:265-312`` would spin
    forever there; the jit path proceeds with the partly-Inf sample set and
    reports it here, the host path raises instead)."""
    theta_opt: Array
    x: Array
    l: Array
    L: Array
    value: Array
    theta_min: Array
    theta_max: Array
    state: CEState
    # Python bool default — a jnp array here would touch the backend at
    # import time; the jit path overrides with a traced bool.
    redraws_exhausted: Array = False
    # Final re-solve still failed after the θ-backoff budget (incl. the
    # forced terminal θ=0 attempt) — x/l/L are then NOT a usable plan and
    # value is +Inf.  Always False on the host path, which raises instead.
    final_failed: Array = False


def init_state(config: CrossEntropyConfig, dtype=jnp.float64) -> CEState:
    return CEState(
        mu_init=jnp.asarray(config.mu_init, dtype),
        sigma_init=jnp.asarray(config.sigma_init, dtype),
        mu=jnp.asarray(config.mu_init, dtype),
        sigma=jnp.asarray(config.sigma_init, dtype),
        theta_min=jnp.asarray(jnp.inf, dtype),
        theta_max=jnp.asarray(0.0, dtype),
        iter_current=0)


def get_positive_samples(key: Array, mu: Array, sigma: Array,
                         num_samples: int, dtype=jnp.float64) -> Array:
    """Draw ``num_samples`` iid samples of θ ~ N(μ, σ) conditioned on θ > 0.

    The reference rejection-samples until enough positives accumulate
    (``…:233-246``); sampling from the truncated normal directly is the
    statistically identical, static-shape formulation (SURVEY.md §7 hard
    part "exact-parity RNG semantics": parity is distributional).
    """
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    lower = (0.0 - mu) / sigma
    z = jax.random.truncated_normal(key, lower, jnp.asarray(jnp.inf, dtype),
                                    (num_samples,), dtype)
    return mu + sigma * z



@lru_cache(maxsize=128)
def make_cost_fn(problem: RiskSensitiveProblem, config: CrossEntropyConfig):
    """Jitted batched outer objective: ``cost(θ) = ileqg_value(θ) +
    kl_bound/θ`` (``…:193``) over a θ-bank.

    Cached per ``(problem, config)`` so MPC re-plans don't rebuild (and
    recompile) the bank every ``solve`` call."""
    bank = make_batched_solver(problem, config.ileqg)

    def cost_fn(x0, u_init, thetas, kl_bound):
        res = bank(x0, u_init, thetas)
        cost = res.value + kl_bound / thetas
        # A NaN objective is a failed solve: mask it to Inf like every
        # other failure (the Inf-masking invariant).  Without this, NaN
        # lanes sort opposite ways in the host (np.argsort: last) and jit
        # (top_k(-c): FIRST → NaN elites poison the refit) paths.
        return jnp.where(jnp.isnan(cost), jnp.asarray(jnp.inf, cost.dtype),
                         cost)

    return jax.jit(cost_fn)


def _update_theta_range(state: CEState, thetas: np.ndarray,
                        costs: np.ndarray) -> CEState:
    """θ_min/θ_max bookkeeping over feasible samples, preserving the
    reference's exact if/elseif order (``…:314-324``)."""
    theta_min = float(state.theta_min)
    theta_max = float(state.theta_max)
    for th, c in zip(thetas, costs):
        if np.isinf(c):
            continue
        if th < theta_min:
            theta_min = th
        elif th > theta_max:
            theta_max = th
    return state._replace(
        theta_min=jnp.asarray(theta_min, state.theta_min.dtype),
        theta_max=jnp.asarray(theta_max, state.theta_max.dtype))


# Feasibility-redraw budget for one CE generation.  The reference's loop
# (``…:265-312``) is unbounded and can hang on a persistently-infeasible
# (μ, σ); we bound it in parity with the jit path (ratilqr_jit._MAX_REDRAWS)
# and surface the failure instead.
_MAX_REDRAWS = 25


def step(config: CrossEntropyConfig, state: CEState, cost_fn, x0: Array,
         u_init: Array, kl_bound: float, key: Array,
         verbose: bool = False) -> Tuple[CEState, Array]:
    """One CE generation (``step!``, ``…:252-335``): draw positive θ samples,
    evaluate the bank, apply the iteration-1 feasibility rescaling of
    ``μ_init/σ_init`` (``…:293-305``), refit the elite Gaussian.

    Raises ``RuntimeError`` if the feasibility redraw loop exhausts its
    ``_MAX_REDRAWS`` budget (see module note above).
    """
    state = state._replace(iter_current=state.iter_current + 1)
    dtype = state.mu.dtype
    lam = config.lam
    threshold = max(config.num_elite, config.num_samples * lam)

    for _redraw in range(_MAX_REDRAWS):
        key, sub = jax.random.split(key)
        if state.iter_current == 1:
            mu_s, sigma_s = state.mu_init, state.sigma_init
        else:
            mu_s, sigma_s = state.mu, state.sigma
        thetas = get_positive_samples(sub, mu_s, sigma_s,
                                      config.num_samples, dtype)
        costs = cost_fn(x0, u_init, thetas, kl_bound)
        costs_np = np.asarray(costs)
        thetas_np = np.asarray(thetas)
        num_valid = int(np.sum(np.isfinite(costs_np)))
        if verbose:
            print(f"**CE iter {state.iter_current}: "
                  f"{num_valid}/{config.num_samples} valid")

        if state.iter_current == 1 and num_valid < threshold:
            # Too few feasible lanes: shrink the warm-start distribution and
            # redraw (persists to the next MPC cycle, ref :293-298).
            state = state._replace(mu_init=state.mu_init * lam,
                                   sigma_init=state.sigma_init * lam)
            continue
        if state.iter_current == 1 and num_valid == config.num_samples:
            state = state._replace(mu_init=state.mu_init / lam,
                                   sigma_init=state.sigma_init / lam)
            break
        if num_valid >= threshold:
            break
        # iter > 1 with too few valid: the reference redraws with unchanged
        # (μ, σ) until enough lanes are feasible (no branch fires, :265-312).
    else:
        raise RuntimeError(
            f"CE feasibility redraw budget exhausted ({_MAX_REDRAWS} "
            f"redraws, {num_valid}/{config.num_samples} feasible at "
            f"μ={float(mu_s)}, σ={float(sigma_s)}): every sampled θ leads "
            "to neurotic breakdown — the problem is likely infeasible at "
            "this kl_bound")

    state = _update_theta_range(state, thetas_np, costs_np)

    # Elite sort + ML Gaussian refit (biased σ estimator, ref :326-334).
    order = np.argsort(costs_np, kind="stable")
    elite = thetas_np[order[:config.num_elite]]
    mu_new = float(np.sum(elite) / config.num_elite)
    sigma_new = float(np.sqrt(np.sum((elite - mu_new) ** 2)
                              / config.num_elite))
    state = state._replace(mu=jnp.asarray(mu_new, dtype),
                           sigma=jnp.asarray(sigma_new, dtype))
    return state, key


# Safety bound on the final-solve θ-backoff retry loop (ref :390-414 is
# unbounded; θ_opt decreases by σ each round and iLQG at θ=0 succeeds for
# any well-posed problem, so this only guards true pathologies).
_MAX_FINAL_RETRIES = 100


def solve(problem: RiskSensitiveProblem, config: CrossEntropyConfig,
          state: CEState, x0: Array, u_init: Array, key: Array, *,
          kl_bound: float, verbose: bool = False) -> RATiLQRResult:
    """RAT iLQR ``solve!`` (``…:364-415``).

    ``kl_bound == 0`` degenerates to pure iLQG (θ_opt = 0, ref :386-389).
    The final full iLEQG re-solve retries with ``θ_opt ← max(0, θ_opt − σ)``
    on neurotic breakdown (ref :390-414).  Returns the updated :class:`CEState`
    whose ``mu_init/sigma_init`` must be threaded into the next MPC re-plan.
    """
    if kl_bound < 0:
        raise ValueError("KL divergence bound must be non-negative")
    verbose = verbose or config.verbose
    dtype = x0.dtype
    # initialize! (ref :133-138): reset (μ, σ) from warm-started inits.
    state = state._replace(
        iter_current=0, mu=state.mu_init, sigma=state.sigma_init,
        theta_min=jnp.asarray(jnp.inf, dtype),
        theta_max=jnp.asarray(0.0, dtype))

    cost_fn = make_cost_fn(problem, config)
    if kl_bound > 0:
        while state.iter_current < config.iter_max:
            state, key = step(config, state, cost_fn, x0, u_init, kl_bound,
                              key, verbose)
        theta_opt = float(state.theta_max if config.use_theta_max
                          else state.mu)
    else:
        theta_opt = 0.0

    sigma = float(state.sigma)
    for _ in range(_MAX_FINAL_RETRIES):
        # 1-lane bank → Pallas DP on TPU (~3x vs the unbatched scan path).
        res: ILEQGResult = solve_via_bank(problem, config.ileqg, x0,
                                          u_init, theta_opt)
        if not bool(res.failed):
            if kl_bound > 0:
                # θ_opt can reach exactly 0 via the backoff (or θ_max with
                # no feasible samples); the reference's kl_bound/0.0
                # evaluates to Inf (Julia float semantics) — match it
                # instead of raising ZeroDivisionError.
                extra = (kl_bound / theta_opt if theta_opt > 0.0
                         else float("inf"))
                value = res.value + extra
                tmin, tmax = state.theta_min, state.theta_max
            else:
                value = res.value
                # Parity: with kl_bound == 0 the reference returns the
                # literal pair (0.0, 0.0) for the θ-range (ref :408),
                # NOT the solver's initialize!-reset fields.
                tmin = jnp.asarray(0.0, dtype)
                tmax = jnp.asarray(0.0, dtype)
            return RATiLQRResult(
                theta_opt=jnp.asarray(theta_opt, dtype), x=res.x, l=res.l,
                L=res.L, value=value, theta_min=tmin, theta_max=tmax,
                state=state)
        # Neurotic breakdown at θ_opt: back off by σ (ref :410-413).
        if verbose:
            print(f"θ_opt == {theta_opt} resulted in neurotic breakdown. "
                  f"Re-trying with θ_opt == {max(0.0, theta_opt - sigma)}")
        theta_opt = max(0.0, theta_opt - sigma)
        if sigma == 0.0 and theta_opt > 0.0:
            # Collapsed elite σ cannot make progress (the reference's
            # unbounded loop would spin at the same θ forever); jump
            # straight to the reference's terminal θ = 0 attempt.
            theta_opt = 0.0
    raise RuntimeError("RAT iLQR final solve failed even at θ = 0")


@dataclasses.dataclass
class RATiLQRSolver:
    """Stateful convenience wrapper matching the reference's object-style
    usage: holds the warm-start state across repeated ``solve`` calls
    (MPC re-planning, SURVEY.md §3.5)."""
    problem: RiskSensitiveProblem
    config: CrossEntropyConfig = CrossEntropyConfig()
    state: Optional[CEState] = None

    def solve(self, x0: Array, u_init: Array, key: Array, *,
              kl_bound: float, verbose: bool = False) -> RATiLQRResult:
        if self.state is None:
            self.state = init_state(self.config, x0.dtype)
        res = solve(self.problem, self.config, self.state, x0, u_init, key,
                    kl_bound=kl_bound, verbose=verbose)
        self.state = res.state
        return res
