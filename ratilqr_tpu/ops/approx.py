"""Model approximation: linearize dynamics, quadratize costs.

TPU-native counterpart of ``approximate_model`` / ``ApproximationResult``
(``/root/reference/src/ileqg.jl:242-322``).

The reference runs a serial per-timestep loop of ForwardDiff closures (with a
commented-out ``Threads.@threads`` at ``ileqg.jl:293`` noting the loop is
embarrassingly parallel).  Here the whole stack of derivatives is one
``vmap`` over the time axis of ``jax.jacfwd`` / ``jax.grad`` /
``jax.hessian`` — a single fused batched computation.

As a TPU-side extension we also precompute ``W⁻¹`` and ``logdet W`` per
timestep (via Cholesky) since the Riccati recursion needs them every backward
step (``ileqg.jl:365,387``) and they are loop-invariant.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ratilqr_tpu.problems import RiskSensitiveProblem

Array = jnp.ndarray


class Approximation(NamedTuple):
    """Batched-over-time Taylor approximation around a nominal trajectory.

    Counterpart of ``ApproximationResult`` (``ileqg.jl:242-252``), with the
    terminal entries split out (the reference appends them as index ``N+1``,
    ``ileqg.jl:314-316``) and stacked arrays instead of vectors-of-matrices.
    """
    q: Array          # (N,)      stage cost  c(k, x̄, ū)
    q_vec: Array      # (N, n)    c_x
    Q: Array          # (N, n, n) c_xx (symmetrized)
    r: Array          # (N, m)    c_u
    R: Array          # (N, m, m) c_uu (symmetrized)
    P: Array          # (N, m, n) c_ux
    A: Array          # (N, n, n) f_x
    B: Array          # (N, n, m) f_u
    W: Array          # (N, n, n) noise covariance
    W_inv: Array      # (N, n, n) precomputed W⁻¹
    logdet_W: Array   # (N,)      precomputed log det W
    q_term: Array     # ()        h(x̄_N)
    q_vec_term: Array  # (n,)     h_x
    Q_term: Array     # (n, n)    h_xx (symmetrized)

    @property
    def N(self) -> int:
        return self.q.shape[0]


# Symmetrize — counterpart of the reference's ``Symmetric`` wrapping of AD
# Hessians (``ileqg.jl:270-273``); single shared implementation.
from ratilqr_tpu.ops import smallmat  # noqa: E402
from ratilqr_tpu.ops.smallmat import sym as _sym  # noqa: E402


def approximate_model(problem: RiskSensitiveProblem, u_traj: Array,
                      x_traj: Array, A: Optional[Array] = None,
                      B: Optional[Array] = None) -> Approximation:
    """Build the time-batched linear-quadratic approximation.

    Counterpart of ``approximate_model`` (``ileqg.jl:258-322``).  ``A``/``B``
    may be passed precomputed (the reference's ``A_array_input`` fast path,
    ``ileqg.jl:261-262,302-311``) to skip dynamics AD.

    Args:
      u_traj: ``(N, m)`` nominal controls.
      x_traj: ``(N+1, n)`` nominal states.
    """
    f, c, h, W = problem.f, problem.c, problem.h, problem.W
    N = u_traj.shape[0]
    ks = jnp.arange(N)
    xs, us = x_traj[:-1], u_traj

    # Cost quadratization, vmapped over time (replaces the per-step
    # ForwardDiff closures at ileqg.jl:265-273).
    def stage(k, x, u):
        q = c(k, x, u)
        q_vec = jax.grad(c, argnums=1)(k, x, u)
        Qm = _sym(jax.hessian(c, argnums=1)(k, x, u))
        r = jax.grad(c, argnums=2)(k, x, u)
        Rm = _sym(jax.hessian(c, argnums=2)(k, x, u))
        # P = c_ux = d/dx (c_u)   (m, n)  — matches cux at ileqg.jl:269.
        Pm = jax.jacfwd(jax.grad(c, argnums=2), argnums=1)(k, x, u)
        return q, q_vec, Qm, r, Rm, Pm

    q, q_vec, Q, r, R, P = jax.vmap(stage)(ks, xs, us)

    if A is None or B is None:
        # Recompute ONLY the missing Jacobian stacks -- the reference's
        # A_array_input/B_array_input fast paths are independent
        # (ileqg.jl:302-311), and a user-supplied analytic A may
        # intentionally differ from AD of f.
        if problem.has_jacobian:
            def dyn_jac(x, u):
                _, Am, Bm = problem.f_jac(x, u)
                return Am, Bm
        else:
            def dyn_jac(x, u):
                return (jax.jacfwd(f, argnums=0)(x, u),
                        jax.jacfwd(f, argnums=1)(x, u))
        A_ad, B_ad = jax.vmap(dyn_jac)(xs, us)
        A = A_ad if A is None else A
        B = B_ad if B is None else B

    Wm = jax.vmap(W)(ks)
    # Loop-invariant W factorization for the Riccati backward pass
    # (closed-form small-matrix Cholesky: fusable, no custom calls).
    W_chol = smallmat.cholesky(Wm)
    W_inv = smallmat.cho_inverse(W_chol)
    logdet_W = smallmat.cho_logdet(W_chol)

    q_term = h(x_traj[-1])
    q_vec_term = jax.grad(h)(x_traj[-1])
    Q_term = _sym(jax.hessian(h)(x_traj[-1]))

    return Approximation(q=q, q_vec=q_vec, Q=Q, r=r, R=R, P=P, A=A, B=B,
                         W=Wm, W_inv=W_inv, logdet_W=logdet_W, q_term=q_term,
                         q_vec_term=q_vec_term, Q_term=Q_term)


class FoldedApprox(NamedTuple):
    """Closed-loop-*folded* evaluation stack: the policy-evaluating Riccati
    recursion under fixed gains ``L`` with ``dl = 0`` (the line-search
    candidate and ``initialize!`` evaluations, ``ileqg.jl:412-465`` with
    zero offsets) depends on the per-step data ONLY through

        q̄_vec = q_vec + Lᵀ r
        Q̄     = Q + LᵀP + PᵀL + LᵀRL + μ LᵀL
        Ā     = A + B L

    (algebra: substitute ``g = r + BᵀDs⃗``, ``G = P + BᵀDSA``,
    ``H = R + BᵀDSB + μI`` into the ``s⃗``/``S`` updates at
    ``ileqg.jl:458-459`` and collect — the cross terms assemble exactly
    into ``ĀᵀDs⃗`` and ``ĀᵀDSĀ``).  Folding at approximation time shrinks
    the materialized stack from 46 to 22 floats/step/lane — the line-search
    trial is HBM-round-trip-bound at headline bank sizes
    (docs/performance.md "Warm re-plan device budget"), so this is a direct
    latency cut on the hottest non-DP slice.
    """
    q: Array          # (N,)      stage cost  c(k, x̄, ū)
    q_vec: Array      # (N, n)    q̄_vec (folded)
    Q: Array          # (N, n, n) Q̄ (folded, symmetrized)
    A: Array          # (N, n, n) Ā = A + B L (closed-loop dynamics)
    W: Array          # (N, n, n) noise covariance
    W_inv: Array      # (N, n, n) precomputed W⁻¹
    logdet_W: Array   # (N,)      precomputed log det W
    q_term: Array     # ()        h(x̄_N)
    q_vec_term: Array  # (n,)     h_x
    Q_term: Array     # (n, n)    h_xx (symmetrized)

    @property
    def N(self) -> int:
        return self.q.shape[0]


def approximate_folded(problem: RiskSensitiveProblem, x_ref: Array,
                       l_traj: Array, L_traj: Optional[Array] = None,
                       mu: Optional[Array] = None,
                       unroll: int = 1) -> FoldedApprox:
    """Fused rollout + quadratization + closed-loop fold in ONE scan.

    Rolls out the policy (closed-loop ``u = l + L(x − x̄)`` around ``x_ref``
    when ``L_traj`` is given — the line-search candidate, ``ileqg.jl:
    510-521`` — else open-loop from ``x_ref`` as the initial state, the
    ``initialize!`` evaluation) and emits ONLY the folded 22-float stack
    per step: the (x, u, A, B) trajectory stacks and the 40-float
    :class:`Approximation` never materialize in HBM.  The realized states/
    controls are bit-identical to :func:`~ratilqr_tpu.ops.rollout.
    rollout_feedback_with_jac` + :func:`approximate_model` (same inputs
    through the same ops); the folded entries equal the algebraic
    identities above.

    ``mu`` enters only through the ``μLᵀL`` term of ``Q̄`` (the evaluating
    pass's ``H = … + μI``, ``ileqg.jl:444``); ignored when ``L_traj`` is
    ``None`` (where the fold degenerates to the raw stack).
    """
    from ratilqr_tpu.ops.rollout import (rollout_feedback_with_jac,
                                         rollout_open_loop_with_jac)

    c, W = problem.c, problem.W
    fold = L_traj is not None
    if fold and mu is None:
        raise ValueError(
            "approximate_folded: mu is required when L_traj is given (it "
            "enters Q̄ through the evaluating pass's H = … + μI term); "
            "pass mu=0 explicitly for an unregularized evaluation")
    N = l_traj.shape[0]
    ks = jnp.arange(N)

    # Rollout exactly as the unfolded path (same scan, same ops — the
    # realized (x, u) are bit-identical to the post-search
    # re-materialization), then quadratize + fold as ONE time-vmapped
    # stage.  Deliberately NOT fused into the scan: per-step AD inside the
    # scan body replaces the single big fused quadratization with T
    # sequential small kernels, measured a net loss at headline banks.
    if fold:
        x_traj, u_traj, A, B = rollout_feedback_with_jac(
            problem, x_ref, l_traj, L_traj, unroll=unroll)
    else:
        x_traj, A, B = rollout_open_loop_with_jac(problem, x_ref, l_traj,
                                                  unroll=unroll)
        u_traj = l_traj

    def stage(k, x, u, A_t, B_t, L_t):
        q = c(k, x, u)
        q_vec = jax.grad(c, argnums=1)(k, x, u)
        Qm = _sym(jax.hessian(c, argnums=1)(k, x, u))
        if fold:
            r = jax.grad(c, argnums=2)(k, x, u)
            Rm = _sym(jax.hessian(c, argnums=2)(k, x, u))
            Pm = jax.jacfwd(jax.grad(c, argnums=2), argnums=1)(k, x, u)
            # Unrolled small-matrix algebra (smallmat.mm/mv): under the
            # bank vmap L is PER-LANE, and batched tiny dot_generals cost
            # an order of magnitude more than the equivalent elementwise
            # VPU ops (measured 4x on a warm B=65k bank solve when they
            # sat inside the rollout scan).
            Lt = smallmat.mt(L_t)
            q_vec = q_vec + smallmat.mv(Lt, r)
            LtP = smallmat.mm(Lt, Pm)
            Qm = _sym(Qm + LtP + smallmat.mt(LtP)
                      + smallmat.mm(Lt, smallmat.mm(Rm, L_t))
                      + mu * smallmat.mm(Lt, L_t))
            A_t = A_t + smallmat.mm(B_t, L_t)
        return q, q_vec, Qm, A_t

    Ls = L_traj if fold else B  # unused placeholder when not folding
    q, q_vec, Qf, Af = jax.vmap(stage)(ks, x_traj[:-1], u_traj, A, B, Ls)

    Wm = jax.vmap(W)(ks)
    W_chol = smallmat.cholesky(Wm)
    W_inv = smallmat.cho_inverse(W_chol)
    logdet_W = smallmat.cho_logdet(W_chol)

    q_term = problem.h(x_traj[-1])
    q_vec_term = jax.grad(problem.h)(x_traj[-1])
    Q_term = _sym(jax.hessian(problem.h)(x_traj[-1]))

    return FoldedApprox(q=q, q_vec=q_vec, Q=Qf, A=Af, W=Wm, W_inv=W_inv,
                        logdet_W=logdet_W, q_term=q_term,
                        q_vec_term=q_vec_term, Q_term=Q_term)
