"""Trajectory rollout and cost-integration kernels.

TPU-native counterpart of the reference's four ``simulate_dynamics``
overloads and ``integrate_cost`` (``/root/reference/src/ileqg.jl:18-124``).

Each rollout is a single ``lax.scan`` over the horizon — XLA compiles the
whole trajectory into one fused loop, and every function here is
``vmap``-compatible so solver banks (θ-samples, CEM control samples,
Monte-Carlo trajectory samples) batch onto the MXU/VPU without Python loops.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.problems import GenerativeProblem, RiskSensitiveProblem

Array = jnp.ndarray


def _time_indices(N: int) -> Array:
    return jnp.arange(N)


def rollout_open_loop(problem: RiskSensitiveProblem, x0: Array,
                      u_traj: Array) -> Array:
    """Noiseless open-loop rollout ``x_{t+1} = f(x_t, u_t)``.

    Counterpart of ``simulate_dynamics`` overload (a)
    (``ileqg.jl:18-38``).  Returns ``x_traj`` with shape ``(N+1, n)``.
    """

    def step(x, u):
        x_next = problem.f(x, u)
        return x_next, x_next

    _, xs = lax.scan(step, x0, u_traj)
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_open_loop_with_jac(problem: RiskSensitiveProblem, x0: Array,
                               u_traj: Array,
                               unroll: int = 1) -> Tuple[Array, Array, Array]:
    """Open-loop rollout also collecting dynamics Jacobians ``A_t, B_t``.

    Counterpart of the ``f_returns_jacobian=true`` branch of
    ``simulate_dynamics`` (``ileqg.jl:24-31``).  When the problem supplies
    ``f_jac`` it is used directly; otherwise Jacobians come from
    ``jax.jacfwd`` fused into the same scan.

    Returns ``(x_traj (N+1, n), A (N, n, n), B (N, n, m))``.
    """
    if problem.has_jacobian:
        fj = problem.f_jac
    else:
        def fj(x, u):
            x_next = problem.f(x, u)
            A = jax.jacfwd(problem.f, argnums=0)(x, u)
            B = jax.jacfwd(problem.f, argnums=1)(x, u)
            return x_next, A, B

    def step(x, u):
        x_next, A, B = fj(x, u)
        return x_next, (x_next, A, B)

    _, (xs, As, Bs) = lax.scan(step, x0, u_traj, unroll=unroll)
    return jnp.concatenate([x0[None], xs], axis=0), As, Bs


def rollout_open_loop_noisy(problem: RiskSensitiveProblem, x0: Array,
                            u_traj: Array, key: Array) -> Array:
    """Noisy open-loop rollout ``x_{t+1} = f(x_t, u_t) + w_t``,
    ``w_t ~ N(0, W(t))``.

    Counterpart of ``simulate_dynamics`` overload (b) (``ileqg.jl:44-55``);
    the per-step ``MvNormal`` draw becomes ``chol(W(t)) @ z`` with
    counter-based JAX PRNG replacing the mutable RNG stream.
    """
    n = x0.shape[0]
    N = u_traj.shape[0]
    zs = jax.random.normal(key, (N, n), dtype=x0.dtype)
    # W depends only on k: factor all N covariances OUTSIDE the scan (a
    # cholesky custom call inside the scan body is an unfusable per-step
    # kernel boundary -- see ops/smallmat.py).
    ws = jnp.einsum("kij,kj->ki",
                    jnp.linalg.cholesky(jax.vmap(problem.W)(
                        _time_indices(N))), zs)

    def step(x, inp):
        u, w = inp
        x_next = problem.f(x, u) + w
        return x_next, x_next

    _, xs = lax.scan(step, x0, (u_traj, ws))
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_feedback(problem: RiskSensitiveProblem, x_ref: Array,
                     l_traj: Array, L_traj: Array) -> Tuple[Array, Array]:
    """Noiseless closed-loop rollout under the affine policy
    ``u_t = l_t + L_t (x_t - x̄_t)`` around reference trajectory ``x̄``.

    Counterpart of ``simulate_dynamics`` overload (c) (``ileqg.jl:62-87``).
    Returns ``(x_traj (N+1, n), u_traj (N, m))``.
    """

    def step(x, inp):
        x_ref_t, l_t, L_t = inp
        u = l_t + L_t @ (x - x_ref_t)
        x_next = problem.f(x, u)
        return x_next, (x_next, u)

    x0 = x_ref[0]
    _, (xs, us) = lax.scan(step, x0, (x_ref[:-1], l_traj, L_traj))
    return jnp.concatenate([x0[None], xs], axis=0), us


def rollout_feedback_with_jac(
        problem: RiskSensitiveProblem, x_ref: Array, l_traj: Array,
        L_traj: Array, unroll: int = 1) -> Tuple[Array, Array, Array, Array]:
    """Closed-loop rollout also collecting Jacobians ``A_t, B_t``
    (``ileqg.jl:71-79``).  Returns ``(x_traj, u_traj, A, B)``."""
    if problem.has_jacobian:
        fj = problem.f_jac
    else:
        def fj(x, u):
            return (problem.f(x, u),
                    jax.jacfwd(problem.f, argnums=0)(x, u),
                    jax.jacfwd(problem.f, argnums=1)(x, u))

    def step(x, inp):
        x_ref_t, l_t, L_t = inp
        u = l_t + L_t @ (x - x_ref_t)
        x_next, A, B = fj(x, u)
        return x_next, (x_next, u, A, B)

    x0 = x_ref[0]
    _, (xs, us, As, Bs) = lax.scan(step, x0, (x_ref[:-1], l_traj, L_traj),
                                   unroll=unroll)
    return jnp.concatenate([x0[None], xs], axis=0), us, As, Bs


def rollout_feedback_noisy(problem: RiskSensitiveProblem, x_ref: Array,
                           l_traj: Array, L_traj: Array,
                           key: Array) -> Tuple[Array, Array]:
    """Noisy closed-loop rollout (``ileqg.jl:94-109``)."""
    n = x_ref.shape[1]
    N = l_traj.shape[0]
    zs = jax.random.normal(key, (N, n), dtype=x_ref.dtype)
    # Per-step noise precomputed outside the scan (see the open-loop
    # variant above).
    ws = jnp.einsum("kij,kj->ki",
                    jnp.linalg.cholesky(jax.vmap(problem.W)(
                        _time_indices(N))), zs)

    def step(x, inp):
        x_ref_t, l_t, L_t, w = inp
        u = l_t + L_t @ (x - x_ref_t)
        x_next = problem.f(x, u) + w
        return x_next, (x_next, u)

    x0 = x_ref[0]
    _, (xs, us) = lax.scan(
        step, x0, (x_ref[:-1], l_traj, L_traj, ws))
    return jnp.concatenate([x0[None], xs], axis=0), us


def integrate_cost(problem, x_traj: Array, u_traj: Array) -> Array:
    """Total trajectory cost ``Σ_k c(k, x_k, u_k) + h(x_N)``
    (``ileqg.jl:115-124``).  Works for both problem types."""
    N = u_traj.shape[0]
    ks = _time_indices(N)
    stage = jax.vmap(problem.c)(ks, x_traj[:-1], u_traj)
    return jnp.sum(stage) + problem.h(x_traj[-1])


def rollout_generative(problem: GenerativeProblem, x0: Array, u_traj: Array,
                       key: Array, use_true_model: bool = False,
                       unroll: int = 1) -> Tuple[Array, Array]:
    """Single stochastic rollout of a generative problem, fused with cost
    accumulation.

    Counterpart of the inner loop of PETS' ``compute_cost_worker``
    (``pets.jl:84-97``): steps ``x_{t+1} = f_stochastic(x_t, u_t, key_t)``,
    accumulating ``Σ c(t, x_t, u_t)``; returns ``(x_traj (N+1, n), total
    cost incl. terminal)``.  ``use_true_model`` is static.  ``unroll``
    fuses that many time steps per scan round — under a PETS rollout grid
    each step is a tiny elementwise+PRNG kernel whose fixed sequencing
    overhead dominates, so unrolling is a pure-perf knob (bit-identical
    results; see ``PETSConfig.scan_unroll``).
    """
    N = u_traj.shape[0]
    keys = jax.random.split(key, N)

    def step(carry, inp):
        x, cost = carry
        k, u, subkey = inp
        cost = cost + problem.c(k, x, u)
        x_next = problem.f_stochastic(x, u, subkey, use_true_model)
        return (x_next, cost), x_next

    # Derive the zero-cost init from x0 so it inherits x0's device-varying
    # type under shard_map (a literal zero would be replicated and the scan
    # carry would fail the varying-axes type check).
    cost0 = jnp.sum(x0 * 0)
    (x_N, cost), xs = lax.scan(
        step, (x0, cost0), (_time_indices(N), u_traj, keys),
        unroll=unroll)
    cost = cost + problem.h(x_N)
    return jnp.concatenate([x0[None], xs], axis=0), cost
