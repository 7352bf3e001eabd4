"""On-device closed-loop MPC episodes: the whole receding-horizon loop as
one ``lax.scan``, vmappable over seeds.

The reference's experiment pattern (docs usage loop,
``docs/source/getting-started.md:96-115``; the RA-L paper's model-mismatch
study) is a host loop: per step, ``solve!`` → execute the first step of the
affine policy ``π_k(x) = L_k(x − x̄_k) + l_k`` (``ileqg.jl:632-633``) → step
the true world → shift the warm start.  :class:`~ratilqr_tpu.mpc.MPCDriver`
reproduces that host loop one device dispatch per re-plan — which on the
tunneled TPU runtime costs ~27 ms of dispatch latency each, dominating
Monte-Carlo closed-loop evaluation across seeds.

This module compiles the ENTIRE episode into a single jitted ``lax.scan``
(plan → act → simulate → shift), so a full model-mismatch study
(controllers × seeds × episode steps) is a handful of dispatches: the
episode runner is ``vmap``-able over PRNG keys and initial states, turning
per-seed episodes into lanes of one device program.

Solver-state warm starts (CE's μ_init/σ_init, NM's θ inits, PETS's control
distribution — the reference's mutable solver structs, SURVEY.md §3.5) are
explicit scan carries, preserved exactly as the host driver preserves them.

Neurotic-breakdown fallback: a fixed hand-picked θ can become infeasible
mid-episode (``value = Inf``).  The reference's bilevel solvers auto-tune
around this; for fixed-θ controllers the paper's experiment falls back to
the risk-neutral plan.  ``fallback`` implements that branchlessly: the
fallback plan's outputs are selected where the primary's value is
non-finite, and the per-step ``fallbacks`` flag records it.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.config import (CrossEntropyConfig, ILEQGConfig,
                                NelderMeadConfig, PETSConfig)
from ratilqr_tpu.mpc import (affine_policy_control, make_gaussian_simulator,
                             shift_warm_start)
from ratilqr_tpu.problems import GenerativeProblem, RiskSensitiveProblem

Array = jnp.ndarray


class PlanOut(NamedTuple):
    """Normalized planner output — what the episode step needs from any
    solver: the affine policy ``(x̄, l, L)`` and its objective value.

    ``aux`` is an arbitrary per-re-plan diagnostic pytree (e.g. the
    bilevel solvers' ``θ_opt``) stacked into ``EpisodeResult.aux``; it is
    NOT touched by the fallback selection (the primary's diagnostics are
    kept even when the fallback's policy is executed)."""
    x: Array       # (N+1, n) nominal trajectory the gains are about
    l: Array       # (N, m)   feedforward controls
    L: Array       # (N, m, n) feedback gains
    value: Array   # ()       planner objective; +Inf = infeasible
    aux: Any = ()  # per-re-plan diagnostics (θ_opt, ranges, ...)


class EpisodeResult(NamedTuple):
    """One closed-loop episode (leading ``(num_steps, ...)`` axes; a fleet
    run prepends the seed axis)."""
    xs: Array          # (steps+1, n) realized states (incl. terminal)
    us: Array          # (steps, m)   controls actually applied
    values: Array      # (steps,)     planner objective per re-plan
    fallbacks: Array   # (steps,)     primary plan was infeasible
    total_cost: Array  # ()           Σ_k stage_cost(k, x_k, u_k)
    plan_state: Any    # final warm-start state (for episode chaining)
    aux: Any = ()      # stacked per-re-plan PlanOut.aux diagnostics


# ----------------------------------------------------------------------
# Plan-step adapters: jittable (state, x, u_warm, key) -> (state, PlanOut)
# ----------------------------------------------------------------------

def make_ileqg_plan(problem: RiskSensitiveProblem, config: ILEQGConfig,
                    theta: float):
    """Fixed-θ iLQG/iLEQG plan step (stateless; ``state = ()``)."""
    from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve

    def plan_step(state, x, u_warm, key):
        res = ileqg_solve(problem, config, x, u_warm,
                          jnp.asarray(theta, x.dtype))
        return state, PlanOut(x=res.x, l=res.l, L=res.L, value=res.value)

    return plan_step


def make_ratilqr_plan(problem: RiskSensitiveProblem,
                      config: CrossEntropyConfig, kl_bound: float):
    """RAT iLQR plan step via the single-dispatch jitted CE solver
    (``solvers/ratilqr_jit.py``); carries :class:`CEState` across re-plans
    exactly as the reference's mutable solver struct does (ref :66-68)."""
    from ratilqr_tpu.solvers import ratilqr_jit

    def plan_step(state, x, u_warm, key):
        res = ratilqr_jit.solve(problem, config, state, x, u_warm, key,
                                jnp.asarray(kl_bound, x.dtype))
        return res.state, PlanOut(x=res.x, l=res.l, L=res.L,
                                  value=res.value,
                                  aux={"theta_opt": res.theta_opt})

    return plan_step


def make_nm_plan(problem: RiskSensitiveProblem, config: NelderMeadConfig,
                 kl_bound: float):
    """RAT iLQR++ plan step via the jitted speculative-bank Nelder-Mead.

    Requires an all-array :class:`NMState` (scan carries must be
    structurally constant): get one from
    ``nelder_mead_jit.bootstrap_state(problem, config, x0, u0,
    kl_bound=...)`` and pass it as the episode's initial ``plan_state``.
    """
    from ratilqr_tpu.solvers import nelder_mead_jit

    def plan_step(state, x, u_warm, key):
        res = nelder_mead_jit.solve(problem, config, state, x, u_warm,
                                    kl_bound=jnp.asarray(kl_bound, x.dtype))
        return res.state, PlanOut(x=res.x, l=res.l, L=res.L,
                                  value=res.value,
                                  aux={"theta_opt": res.theta_opt})

    return plan_step


def make_pets_plan(problem: GenerativeProblem, config: PETSConfig,
                   sigma_init: Array, use_true_model: bool = False):
    """PETS plan step (stateless; ``state = ()``).  The episode's shifted
    control schedule ``u_warm`` seeds the CEM mean; each re-plan resets Σ
    to ``sigma_init`` (the reference's per-solve ``initialize!``,
    ``pets.jl:70-74``) and runs the full CEM.  PETS returns an open-loop
    policy — zero feedback gains.  ``value`` is the Monte-Carlo mean cost
    of the returned plan (``num_trajectory_samples`` rollouts, evaluated
    with a key folded off the plan key so the CEM draw stream is
    unchanged), making the episode runner's fallback-on-nonfinite and
    ``values`` diagnostics live for PETS too."""
    from ratilqr_tpu.solvers import pets as pets_mod

    def plan_step(state, x, u_warm, key):
        st = pets_mod.init_state(u_warm, jnp.asarray(sigma_init,
                                                     u_warm.dtype))
        out = pets_mod.solve(problem, config, x, st, key, use_true_model)
        value = pets_mod.compute_cost(
            problem, config, x, out.mu[None],
            jax.random.fold_in(key, 1), use_true_model)[0]
        N, m = out.mu.shape
        zeros_L = jnp.zeros((N, m, x.shape[0]), out.mu.dtype)
        x_ref = jnp.zeros((N + 1, x.shape[0]), out.mu.dtype)
        return state, PlanOut(x=x_ref, l=out.mu, L=zeros_L, value=value)

    return plan_step


# ----------------------------------------------------------------------
# Episode runner
# ----------------------------------------------------------------------

def make_episode_runner(
        plan_step: Callable[[Any, Array, Array, Array], tuple],
        simulate: Callable[[Array, Array, Array, Array], Array],
        num_steps: int,
        stage_cost: Callable[[Array, Array, Array], Array],
        fallback: Optional[Callable[[Array, Array, Array], PlanOut]] = None):
    """Build a jitted closed-loop episode runner.

    Args:
      plan_step: ``(plan_state, x, u_warm, key) -> (plan_state, PlanOut)``;
        use the ``make_*_plan`` adapters or any jittable equivalent.
      simulate: true-world transition ``(k, x, u, key) -> x_next`` (``k`` is
        the closed-loop step index) — e.g. :func:`make_gaussian_simulator`
        or a generative problem's ``f_stochastic`` with
        ``use_true_model=True`` for model-mismatch studies.
      num_steps: episode length (static).
      stage_cost: realized running cost ``(k, x, u) -> scalar`` accumulated
        into ``total_cost``.
      fallback: optional jittable ``(x, u_warm, key) -> PlanOut`` used where
        the primary plan's value is non-finite (the paper experiment's
        risk-neutral fallback).  The primary's ``plan_state`` update is kept
        either way, matching the host-loop experiment semantics.

    Returns a jitted ``run(x0, u_init, key, plan_state) -> EpisodeResult``.
    The PRNG key schedule matches :meth:`MPCDriver.run` exactly
    (``key, k_plan, k_sim = jax.random.split(key, 3)`` per step), so the
    scan reproduces the host driver trajectory-for-trajectory.
    """

    def body(carry, k):
        x, u_warm, state, key = carry
        key, k_plan, k_sim = jax.random.split(key, 3)
        state, out = plan_step(state, x, u_warm, k_plan)
        bad = ~jnp.isfinite(out.value)
        if fallback is not None:
            fb = fallback(x, u_warm, k_plan)
            # Select only the policy fields — the primary's aux
            # diagnostics are kept either way (structures may differ).
            picked = jax.tree_util.tree_map(
                lambda a, b: jnp.where(bad, b, a),
                (out.x, out.l, out.L, out.value),
                (fb.x, fb.l, fb.L, fb.value))
            out = out._replace(x=picked[0], l=picked[1], L=picked[2],
                               value=picked[3])
        u = affine_policy_control(x, out.x, out.l, out.L)
        cost = stage_cost(k, x, u)
        x_next = simulate(k, x, u, k_sim)
        u_warm = shift_warm_start(out.l)
        return ((x_next, u_warm, state, key),
                (x, u, out.value, bad, cost, out.aux))

    def run(x0: Array, u_init: Array, key: Array,
            plan_state: Any) -> EpisodeResult:
        plan_state = jax.tree_util.tree_map(jnp.asarray, plan_state)
        carry = (x0, u_init, plan_state, key)
        (x_fin, _, state, _), (xs, us, vals, bad, costs, aux) = lax.scan(
            body, carry, jnp.arange(num_steps))
        return EpisodeResult(
            xs=jnp.concatenate([xs, x_fin[None]], axis=0), us=us,
            values=vals, fallbacks=bad, total_cost=jnp.sum(costs),
            plan_state=state, aux=aux)

    return jax.jit(run)


def make_fleet_runner(plan_step, simulate, num_steps, stage_cost,
                      fallback=None):
    """Monte-Carlo fleet: ``run(x0, u_init, keys, plan_state)`` vmapped over
    a ``(S,)`` batch of PRNG keys — S independent closed-loop episodes
    (shared ``x0``/warm start/initial solver state) in ONE device dispatch.
    For per-seed initial states, vmap the episode runner yourself with
    ``in_axes=(0, None, 0, None)``."""
    run = make_episode_runner(plan_step, simulate, num_steps, stage_cost,
                              fallback)
    return jax.jit(jax.vmap(run, in_axes=(None, None, 0, None)))
