"""Optimal-control problem definitions.

TPU-native counterpart of the reference problem abstraction
(``/root/reference/src/optimal_control_problems.jl:12,67-73,126-131``).

Unlike the reference — which stores opaque Julia callbacks inside mutable
structs and differentiates them with ForwardDiff at solve time — problems here
are *static* containers of pure JAX functions.  Everything downstream
(`lax.scan` rollouts, `vmap`'d linearization, Riccati recursions) traces these
functions exactly once under `jit` and lets XLA fuse them.

Conventions (all shapes static):
  - state ``x``: ``(n,)`` array; control ``u``: ``(m,)`` array.
  - time index ``k``: scalar int array, ``k == 0`` is the initial time
    (matching the reference's 0-indexed cost convention,
    ``optimal_control_problems.jl:28``).
  - trajectories are stacked arrays: ``x_traj (N+1, n)``, ``u_traj (N, m)``,
    gains ``L (N, m, n)`` — never Python lists of vectors.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

Array = jnp.ndarray


class OptimalControlProblem:
    """Abstract base for optimal control problems — counterpart of the
    reference's ``abstract type OptimalControlProblem``
    (``optimal_control_problems.jl:12``)."""


@dataclasses.dataclass(frozen=True)
class RiskSensitiveProblem(OptimalControlProblem):
    """Finite-horizon risk-sensitive optimal control problem.

    Counterpart of ``FiniteHorizonRiskSensitiveOptimalControlProblem``
    (``optimal_control_problems.jl:67-73``): deterministic dynamics
    ``x' = f(x, u)`` subject to additive Gaussian noise ``w ~ N(0, W(k))``,
    stage cost ``c(k, x, u)``, terminal cost ``h(x)``, horizon ``N``.

    Attributes:
      f: pure dynamics function ``f(x, u) -> x_next``; must be traceable by
        JAX (replaces the reference's ForwardDiff-generic requirement,
        ``optimal_control_problems.jl:40-42``).
      c: stage cost ``c(k, x, u) -> scalar`` with traced time index ``k``.
      h: terminal cost ``h(x) -> scalar``.
      W: noise covariance ``W(k) -> (n, n)`` symmetric PSD.
      N: horizon length (static Python int — final time index).
      f_jac: optional user-supplied Jacobian path: ``f_jac(x, u) ->
        (x_next, A, B)`` with ``A = dx'/dx``, ``B = dx'/du``.  Mirrors the
        reference's ``f_returns_jacobian`` protocol
        (``optimal_control_problems.jl:21-26``, ``ileqg.jl:160-162``); when
        absent, Jacobians come from ``jax.jacfwd``.
      tile_model: optional :class:`~ratilqr_tpu.ops.tile_model.TileModel`
        — closed-form model pieces enabling the fused in-kernel
        line-search candidate evaluation on TPU
        (``ops/candidate_pallas.py``); must agree with ``f``/``c``/``h``.
        Problems without one keep the XLA candidate path.
    """

    f: Callable[[Array, Array], Array]
    c: Callable[[Array, Array, Array], Array]
    h: Callable[[Array], Array]
    W: Callable[[Array], Array]
    N: int
    f_jac: Optional[Callable[[Array, Array], tuple]] = None
    tile_model: Optional[object] = None

    def __post_init__(self):
        if self.N <= 0:
            raise ValueError(f"horizon N must be positive, got {self.N}")

    @property
    def has_jacobian(self) -> bool:
        return self.f_jac is not None


@dataclasses.dataclass(frozen=True)
class GenerativeProblem(OptimalControlProblem):
    """Finite-horizon generative stochastic optimal control problem.

    Counterpart of ``FiniteHorizonGenerativeOptimalControlProblem``
    (``optimal_control_problems.jl:126-131``).  The dynamics are stochastic
    and generative: ``f_stochastic(x, u, key, use_true_model) -> x_next``.

    ``key`` is a JAX PRNG key (replacing the reference's ``rng::AbstractRNG``,
    ``optimal_control_problems.jl:82-87``).  ``use_true_model`` is a *static*
    Python bool switching between the solver's internal (possibly wrong)
    model and the true simulator; it is threaded through jit boundaries as a
    static argument so each variant compiles separately.
    """

    f_stochastic: Callable[[Array, Array, Array, bool], Array]
    c: Callable[[Array, Array, Array], Array]
    h: Callable[[Array], Array]
    N: int

    def __post_init__(self):
        if self.N <= 0:
            raise ValueError(f"horizon N must be positive, got {self.N}")
