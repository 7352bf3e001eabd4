"""MPC driver: closed-loop re-planning with cross-call warm starts.

The reference has no MPC executor class — its docs describe the usage
pattern (``docs/source/getting-started.md:96-115``, SURVEY.md §3.5): per
re-plan, call ``solve!`` with the current state and a warm-started control
schedule, execute the first step of the returned affine policy
``π_k(x) = L_k(x − x̄_k) + l_k`` (``ileqg.jl:632-633``), and repeat.  Solver
structs deliberately carry adapted state across calls (CE's μ_init/σ_init,
``cross_entropy_bilevel_optimization.jl:66-68``; NM's θ inits,
``nelder_mead_bilevel_optimization.jl:68-69``).

This module makes that pattern a first-class driver: stateless solver
functions + explicit warm-start pytrees threaded through the loop, with
standard shift-and-hold control warm starting.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ratilqr_tpu.problems import RiskSensitiveProblem

Array = jnp.ndarray


class MPCStep(NamedTuple):
    """Record of one closed-loop MPC step."""
    x: Array           # state at which the plan was made
    u: Array           # control actually applied (first policy step)
    value: Array       # solver objective value
    plan_time_s: float  # wall-clock re-plan latency
    info: Any          # solver-specific extras (θ_opt, ranges, ...)


def shift_warm_start(l_traj: Array) -> Array:
    """Shift the accepted control schedule one step and hold the last
    control — the standard MPC warm start for the next re-plan."""
    return jnp.concatenate([l_traj[1:], l_traj[-1:]], axis=0)


def affine_policy_control(x: Array, x_ref: Array, l: Array,
                          L: Array) -> Array:
    """First-step control of the affine policy ``π_0(x) = L_0(x − x̄_0) +
    l_0`` (``ileqg.jl:632-633``)."""
    return l[0] + L[0] @ (x - x_ref[0])


def make_gaussian_simulator(problem: RiskSensitiveProblem):
    """True-world step ``x⁺ = f(x, u) + w, w ~ N(0, W(k))`` — the default
    simulator for both :class:`MPCDriver` and the episode runners."""

    def simulate(k, x, u, key):
        W = problem.W(k)
        w = jnp.linalg.cholesky(W) @ jax.random.normal(key, x.shape,
                                                       dtype=x.dtype)
        return problem.f(x, u) + w

    return simulate


@dataclasses.dataclass
class MPCDriver:
    """Closed-loop MPC executor.

    Args:
      problem: the planning problem (the solver's model).
      plan: callable ``plan(x, u_warm, key) -> result`` where ``result`` has
        ``.x``, ``.l``, ``.L`` and ``.value`` attributes.
        ``RATiLQRSolver.solve`` satisfies this directly; adapt the others
        with a small lambda, e.g.
        ``lambda x, u, key: ileqg_solve(problem, cfg, x, u, theta)`` or
        ``lambda x, u, key: nm_solver.solve(x, u, kl_bound=d)``.
        Warm-start solver state lives inside the wrapper, exactly as the
        reference's mutable solver structs do.
      simulate: true-world transition ``simulate(k, x, u, key) -> x_next``
        (``k`` is the closed-loop step index); by default the planning
        model plus noise ``w ~ N(0, W(k))``.
    """
    problem: RiskSensitiveProblem
    plan: Callable[[Array, Array, Array], Any]
    simulate: Optional[Callable[[Array, Array, Array, Array], Array]] = None

    def _default_simulate(self, k: Array, x: Array, u: Array,
                          key: Array) -> Array:
        return make_gaussian_simulator(self.problem)(k, x, u, key)

    def run(self, x0: Array, u_init: Array, key: Array,
            num_steps: int) -> List[MPCStep]:
        """Run ``num_steps`` closed-loop steps; returns the step records."""
        sim = self.simulate or self._default_simulate
        x = x0
        u_warm = u_init
        steps: List[MPCStep] = []
        for k in range(num_steps):
            key, k_plan, k_sim = jax.random.split(key, 3)
            t0 = time.perf_counter()
            res = self.plan(x, u_warm, k_plan)
            # Fetch ALL policy outputs (not block_until_ready — a no-op on
            # the tunneled TPU backend) in ONE combined device_get so
            # plan_time_s covers the full end-to-end re-plan: on the async
            # runtime the x/l/L transfers land after the scalar value, and
            # the controller cannot act before it has them.
            jax.device_get((res.x, res.l, res.L, res.value))
            dt = time.perf_counter() - t0
            u = affine_policy_control(x, res.x, res.l, res.L)
            steps.append(MPCStep(x=x, u=u, value=res.value, plan_time_s=dt,
                                 info=getattr(res, "theta_opt", None)))
            x = sim(jnp.asarray(k), x, u, k_sim)
            u_warm = shift_warm_start(res.l)
        return steps
