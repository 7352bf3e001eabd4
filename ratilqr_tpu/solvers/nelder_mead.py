"""RAT iLQR++ — Nelder-Mead bilevel optimization over the risk parameter θ.

TPU-native counterpart of ``NelderMeadBilevelOptimizationSolver``
(``/root/reference/src/nelder_mead_bilevel_optimization.jl:71-352``).

Nelder-Mead over a 1-D simplex ``(θ_low, θ_high)`` is inherently sequential —
each vertex evaluation depends on the previous one — so (exactly like the
reference, whose ``compute_cost_worker`` never actually leaves the calling
process despite its name, ref :134-158) the outer loop is host-driven; each
vertex evaluation is one fully-jitted iLEQG solve.  The reference's own docs
note this needs far fewer iLEQG evaluations than the CE search
(``README.md:15``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ratilqr_tpu.config import NelderMeadConfig
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve
from ratilqr_tpu.solvers.ileqg import solve_via_bank

Array = jnp.ndarray

_MAX_BOOTSTRAP = 60  # feasibility-bootstrap halvings (~18 orders of θ)


def _missing_c(c) -> bool:
    """A vertex cost is "missing" if it is None (fresh host state) OR the
    jit path's concrete-NaN encoding (a kl_bound == 0 jit solve round-trips
    fresh state as NaN arrays — see ``nelder_mead_jit.skip_nm``)."""
    if c is None:
        return True
    return math.isnan(float(c))


class NMState(NamedTuple):
    """Mutable NM solver state (ref :92-99).

    ``theta_high_init``/``theta_low_init`` adapt across ``solve`` calls (MPC
    warm start, ref :68-69).  ``c_high``/``c_low`` are ``None`` until the
    first solve's feasibility bootstrap and are then — faithfully to the
    reference, which only re-computes them under ``isnothing`` (ref
    :283,294) — carried over verbatim into subsequent solves.
    """
    theta_high_init: float
    theta_low_init: float
    theta_high: float
    theta_low: float
    c_high: Optional[float]
    c_low: Optional[float]
    iter_current: int


class NMResult(NamedTuple):
    """``solve!`` return values (ref :264-269) plus the updated state."""
    theta_opt: Array
    x: Array
    l: Array
    L: Array
    value: Array
    state: NMState


def init_state(config: NelderMeadConfig) -> NMState:
    return NMState(theta_high_init=config.theta_high_init,
                   theta_low_init=config.theta_low_init,
                   theta_high=config.theta_high_init,
                   theta_low=config.theta_low_init,
                   c_high=None, c_low=None, iter_current=0)


def _make_cost(problem: RiskSensitiveProblem, config: NelderMeadConfig,
               x0: Array, u_init: Array, kl_bound: float):
    """Single-θ outer objective ``ileqg_value(θ) + kl_bound/θ`` with
    failure→Inf masking (``compute_cost_worker``, ref :134-158)."""

    # Route each vertex evaluation through a 1-lane bank: the vmap fires
    # the Riccati bank dispatch, so TPU runs take the fused Pallas kernel
    # (measured ~3x faster per solve than the unbatched scan path); the
    # lru-cached bank builder reuses one compiled executable across the
    # whole NM search and across MPC re-plans.
    from ratilqr_tpu.solvers.ileqg import make_batched_solver
    bank = make_batched_solver(problem, config.ileqg)

    def cost(theta: float) -> float:
        res = bank(x0, u_init, jnp.asarray([theta], x0.dtype))
        # One combined fetch: each device round trip costs ~27 ms on the
        # tunneled backend and this is the host path's per-vertex unit.
        failed, value = jax.device_get((res.failed[0], res.value[0]))
        v = float(value) + kl_bound / theta
        if bool(failed) or math.isnan(v):
            return math.inf
        return v

    return cost


# Reference-exported name (compute_cost_worker, nm...jl:134).
make_cost = _make_cost


def step(config: NelderMeadConfig, state: NMState, cost,
         verbose: bool = False) -> NMState:
    """One Nelder-Mead iteration (``step!``, ref :174-252): sort, reflect,
    maybe expand; else contract; on failed contraction shrink θ_high toward
    θ_low.  All candidate θ are clamped below by ``theta_low_init``
    (ref :196,205,233)."""
    state = state._replace(iter_current=state.iter_current + 1)
    th_hi, th_lo = state.theta_high, state.theta_low
    c_hi, c_lo = state.c_high, state.c_low
    if c_hi < c_lo:
        th_lo, th_hi = th_hi, th_lo
        c_lo, c_hi = c_hi, c_lo

    theta_m = th_lo
    # reflection
    theta_r = max(state.theta_low_init,
                  theta_m + config.alpha * (theta_m - th_hi))
    c_r = cost(theta_r)
    if verbose:
        print(f"**NM iter {state.iter_current}: reflect "
              f"(θ_r, c_r)=({theta_r:.4g}, {c_r:.4g})")

    if c_r < c_lo:
        # expansion
        theta_e = max(state.theta_low_init,
                      theta_m + config.beta * (theta_r - theta_m))
        c_e = cost(theta_e)
        if c_e < c_r:
            th_hi, c_hi = theta_e, c_e
        else:
            th_hi, c_hi = theta_r, c_r
    else:
        if c_r < c_hi:
            th_hi, c_hi = theta_r, c_r
        # contraction
        theta_c = max(state.theta_low_init,
                      theta_m + config.gamma * (th_hi - theta_m))
        c_c = cost(theta_c)
        if c_c > c_hi:
            # contraction failed: shrink θ_high halfway to θ_low (ref :238-243)
            th_hi = (th_hi + th_lo) / 2.0
            c_hi = cost(th_hi)
        else:
            th_hi, c_hi = theta_c, c_c

    return state._replace(theta_high=th_hi, theta_low=th_lo, c_high=c_hi,
                          c_low=c_lo)


def solve(problem: RiskSensitiveProblem, config: NelderMeadConfig,
          state: NMState, x0: Array, u_init: Array, *, kl_bound: float,
          verbose: bool = False) -> NMResult:
    """RAT iLQR++ ``solve!`` (ref :276-352).

    Feasibility bootstrap repeatedly halves the θ inits until the objective
    is finite (ref :283-304); iteration stops when the stdev of the two
    vertex costs drops below ε (ref :306-317).  ``θ_opt = θ_low``; the final
    iLEQG re-solve has *no* retry loop, matching the reference (unlike RAT
    iLQR's backoff — SURVEY.md §2 C9).
    """
    if kl_bound < 0:
        raise ValueError("KL divergence bound must be non-negative")
    verbose = verbose or config.verbose
    # initialize! (ref :164-168): reset θ from inits; c values persist.
    state = state._replace(iter_current=0,
                           theta_low=state.theta_low_init,
                           theta_high=state.theta_high_init)
    cost = _make_cost(problem, config, x0, u_init, kl_bound)

    if kl_bound > 0:
        if config.refresh_carried_costs:
            # Opt-out of the reference's cross-solve c-persistence quirk
            # (ref :283,294 — see NelderMeadConfig.refresh_carried_costs):
            # drop the carried vertex costs so the feasibility bootstrap
            # below re-evaluates both simplex vertices (already reset to
            # the carried θ inits) at the INCOMING (x0, u_init); its first
            # rung IS the carried θ, so a still-feasible vertex costs one
            # evaluation and an infeasible one falls into the θ-halving
            # ladder exactly as a fresh solve would.
            state = state._replace(c_high=None, c_low=None)
        # Feasibility bootstrap (ref :283-304).  The reference's loop is
        # unbounded and hangs on a problem that fails at EVERY θ (e.g. NaN
        # dynamics); bounded here — like the CE redraw loop — with the
        # failure surfaced as value=Inf from the final solve.
        if _missing_c(state.c_high):
            for i in range(_MAX_BOOTSTRAP):
                c = cost(state.theta_high)
                # On budget exhaustion keep θ AT the last evaluated value
                # (c pairs with the stored θ; the jit ladder matches).
                if math.isfinite(c) or i == _MAX_BOOTSTRAP - 1:
                    break
                state = state._replace(
                    theta_high=state.theta_high * config.lam,
                    theta_high_init=state.theta_high_init * config.lam)
            state = state._replace(c_high=c)
        if _missing_c(state.c_low):
            for i in range(_MAX_BOOTSTRAP):
                c = cost(state.theta_low)
                if math.isfinite(c) or i == _MAX_BOOTSTRAP - 1:
                    break
                state = state._replace(
                    theta_low=state.theta_low * config.lam,
                    theta_low_init=state.theta_low_init * config.lam)
            state = state._replace(c_low=c)

        while True:
            state = step(config, state, cost, verbose)
            c_mean = (state.c_low + state.c_high) / 2.0
            stdev = math.sqrt(0.5 * ((state.c_high - c_mean) ** 2
                                     + (state.c_low - c_mean) ** 2))
            if stdev < config.eps:
                if verbose:
                    print(f"Nelder-Mead converged. stdev == {stdev:.4g}")
                break
            if state.iter_current >= config.iter_max:
                if verbose:
                    print(f"Maximum iterations. stdev == {stdev:.4g}")
                break
        theta_opt = state.theta_low
    else:
        theta_opt = 0.0

    # Final re-solve via a 1-lane bank (Pallas DP on TPU, ~3x faster than
    # the unbatched scan path); no retry loop — reference parity (:334-346).
    res = solve_via_bank(problem, config.ileqg, x0, u_init, theta_opt)
    value = res.value + (kl_bound / theta_opt if kl_bound > 0 else 0.0)
    return NMResult(theta_opt=jnp.asarray(theta_opt, x0.dtype), x=res.x,
                    l=res.l, L=res.L, value=value, state=state)


@dataclasses.dataclass
class NelderMeadSolver:
    """Stateful wrapper carrying warm-start state across MPC re-plans."""
    problem: RiskSensitiveProblem
    config: NelderMeadConfig = NelderMeadConfig()
    state: Optional[NMState] = None

    def solve(self, x0: Array, u_init: Array, *, kl_bound: float,
              verbose: bool = False) -> NMResult:
        if self.state is None:
            self.state = init_state(self.config)
        res = solve(self.problem, self.config, self.state, x0, u_init,
                    kl_bound=kl_bound, verbose=verbose)
        self.state = res.state
        return res
