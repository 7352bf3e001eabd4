"""Parallel-in-time (associative scan) risk-sensitive Riccati recursion.

The sequential backward pass (``ops/riccati.py``) is O(T) in depth.  This
module computes the same value functions in O(log T) parallel depth via
``lax.associative_scan`` — the "Parallelization of Riccati Recursion"
stretch goal from SURVEY.md §2 (cf. Särkkä & García-Fernández, *Temporal
Parallelization of Dynamic Programming and Linear Quadratic Control*).

Key identities that make the risk-sensitive case associative:

  - The risk transform in the backward step is a Möbius (linear-fractional)
    map: ``D S' = S'(I − θW S')⁻¹`` — representable as a value-function
    element with "noise covariance" ``C = −θW``.
  - After eliminating the control (and cost cross-terms, by completing the
    square), the Bellman step is ``S = Q̂ + Âᵀ S̃ (I + Ĉ S̃)⁻¹ Â`` — the same
    parametric family.  Each time step therefore contributes TWO elements
    (control, then risk), and elements compose associatively.
  - Value *constants* (the ``−½gᵀH⁻¹g`` control term, the risk quadratic
    and logdet terms) never feed back into the S/s⃗ recursions, so they are
    recovered per-step (fully parallel) from the scanned suffix values and
    summed with a reverse cumulative sum.

An element ``e = (A, b, C, η, J)`` represents the value-function map

    S_prev = J + Aᵀ (I + S C)⁻¹ S A
    v_prev = η + Aᵀ (I + S C)⁻¹ (v − S b)

with composition (``i`` earlier in time than ``j``):

    A_ij = A_j (I + C_i J_j)⁻¹ A_i          C_ij = A_j (I + C_i J_j)⁻¹ C_i A_jᵀ + C_j
    b_ij = A_j (I + C_i J_j)⁻¹ (b_i + C_i η_j) + b_j
    η_ij = A_iᵀ (I + J_j C_i)⁻¹ (η_j − J_j b_i) + η_i
    J_ij = A_iᵀ (I + J_j C_i)⁻¹ J_j A_i + J_i

This is an *experimental* alternative backend: `dp_optimize_parallel` /
`dp_evaluate_parallel` return exactly the same results as the sequential
`dp_optimize` / `dp_evaluate` (pinned by float64 tests at rtol 1e-8,
including θ>0 risk terms, cost cross-terms, μ-regularization and the
failure flags) but are NOT wired into the default solver path:

  - Measured on the TPU v5e at T=1000/4000 (B=16, f32), the sequential
    scan + Pallas kernel path is 3–6× faster — the associative form does
    O(T log T) work with general (non-SPD) small-matrix solves per
    combine, while the fused sequential kernel is already latency-lean.
  - In float32 the composed Möbius elements lose precision over long
    horizons (products of near-singular transforms); use float64.

It becomes interesting for very long horizons on hardware where sequential
depth, not arithmetic, is the binding constraint.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.ops import smallmat
from ratilqr_tpu.ops.approx import Approximation, _sym
from ratilqr_tpu.ops.riccati import (DPResult, MAX_MU_RESTARTS,
                                     mu_restart_loop)

Array = jnp.ndarray


class Element(NamedTuple):
    A: Array    # (..., n, n)
    b: Array    # (..., n)
    C: Array    # (..., n, n)
    eta: Array  # (..., n)
    J: Array    # (..., n, n)


def _solve(M: Array, B: Array) -> Array:
    """General (non-symmetric) small-matrix solve M X = B."""
    return jnp.linalg.solve(M, B)


def combine(ei: Element, ej: Element) -> Element:
    """Associative composition; ``ei`` earlier in time than ``ej``."""
    n = ei.A.shape[-1]
    eye = jnp.eye(n, dtype=ei.A.dtype)
    M1 = eye + ei.C @ ej.J                      # I + C_i J_j
    # C and J stay symmetric under composition, so I + J_j C_i = M1ᵀ —
    # both solves share the single factorization target M1.
    Aj_M1inv = jnp.swapaxes(
        _solve(jnp.swapaxes(M1, -1, -2), jnp.swapaxes(ej.A, -1, -2)),
        -1, -2)                                  # A_j (I + C_i J_j)⁻¹
    Ai_T_M2inv = jnp.swapaxes(_solve(M1, ei.A), -1, -2)
    A12 = Aj_M1inv @ ei.A
    b12 = (Aj_M1inv @ (ei.b + (ei.C @ ej.eta[..., None])[..., 0]
                       )[..., None])[..., 0] + ej.b
    C12 = Aj_M1inv @ ei.C @ jnp.swapaxes(ej.A, -1, -2) + ej.C
    eta12 = (Ai_T_M2inv @ (ej.eta - (ej.J @ ei.b[..., None])[..., 0]
                           )[..., None])[..., 0] + ei.eta
    J12 = Ai_T_M2inv @ ej.J @ ei.A + ei.J
    return Element(A=A12, b=b12, C=C12, eta=eta12, J=J12)


def _identity_element(n: int, dtype) -> Element:
    eye = jnp.eye(n, dtype=dtype)
    z = jnp.zeros((n,), dtype)
    return Element(A=eye, b=z, C=jnp.zeros((n, n), dtype), eta=z,
                   J=jnp.zeros((n, n), dtype))


def _build_elements(approx: Approximation, theta: Array, mu: Array,
                    L_traj: Optional[Array], dl_traj: Optional[Array]
                    ) -> Element:
    """Stacked per-step elements, interleaved [ctrl_0, risk_0, ctrl_1, …],
    plus the terminal element last; leading dim ``2N + 1``."""
    N = approx.N
    n = approx.A.shape[-1]
    m = approx.B.shape[-1]
    dtype = approx.A.dtype
    eye_m = jnp.eye(m, dtype=dtype)
    optimizing = L_traj is None

    def ctrl_element(q_vec, Q, r, R, P, A, B):
        if optimizing:
            # Complete the square in u: eliminate control + cross terms.
            # R̃ only needs to be INVERTIBLE here (general LU solve, not
            # Cholesky): the sequential path accepts indefinite R as long
            # as H = R̃ + BᵀS̃B is PSD, and the square-completion identity
            # holds for any invertible R̃; PSD-ness of H is still enforced
            # in the per-step phase.  (Exactly singular R̃ with PSD H is
            # the one corner the parallel form cannot represent.)
            R_t = _sym(R + mu * eye_m)
            Kp = jnp.linalg.solve(R_t, P)                 # R̃⁻¹P (m, n)
            u_off = jnp.linalg.solve(R_t, r)              # R̃⁻¹r (m,)
            A_hat = A - B @ Kp
            J_hat = _sym(Q - P.T @ Kp)
            eta_hat = q_vec - P.T @ u_off
            # combine() applies (η_j − J_j b_i): store the NEGATED
            # physical dynamics offset (the offset is −B R̃⁻¹ r).
            b_hat = B @ u_off
            C_hat = B @ jnp.linalg.solve(R_t, B.T)
            return Element(A=A_hat, b=b_hat, C=C_hat, eta=eta_hat, J=J_hat)
        else:
            return None  # built in closed-loop form below

    def ctrl_element_eval(q_vec, Q, r, R, P, A, B, L, dl):
        # Fixed policy u = L δx + dl: closed-loop quadratic cost + dynamics.
        R_t = R + mu * eye_m
        A_cl = A + B @ L
        b_cl = -(B @ dl)   # negated physical offset (+B dl); see above
        J_cl = _sym(Q + L.T @ R_t @ L + P.T @ L + L.T @ P)
        eta_cl = (q_vec + L.T @ r + (P.T + L.T @ R_t) @ dl)
        return Element(A=A_cl, b=b_cl, C=jnp.zeros((n, n), dtype),
                       eta=eta_cl, J=J_cl)

    def risk_element(W):
        return Element(A=jnp.eye(n, dtype=dtype), b=jnp.zeros((n,), dtype),
                       C=-theta * W, eta=jnp.zeros((n,), dtype),
                       J=jnp.zeros((n, n), dtype))

    if optimizing:
        ctrl = jax.vmap(ctrl_element)(approx.q_vec, approx.Q, approx.r,
                                      approx.R, approx.P, approx.A,
                                      approx.B)
    else:
        ctrl = jax.vmap(ctrl_element_eval)(
            approx.q_vec, approx.Q, approx.r, approx.R, approx.P, approx.A,
            approx.B, L_traj, dl_traj)
    risk = jax.vmap(risk_element)(approx.W)

    # Interleave [ctrl_t, risk_t] along time, then append the terminal
    # value as a pure-J element.
    def interleave(c, r):
        return jnp.stack([c, r], axis=1).reshape((2 * N,) + c.shape[1:])

    inter = jax.tree_util.tree_map(interleave, ctrl, risk)
    term = Element(A=jnp.zeros((n, n), dtype), b=jnp.zeros((n,), dtype),
                   C=jnp.zeros((n, n), dtype), eta=approx.q_vec_term,
                   J=_sym(approx.Q_term))
    return jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t[None]], axis=0), inter, term)


def _suffix_values(elements: Element) -> Tuple[Array, Array]:
    """Suffix-composed (S, v) for every element boundary.

    Returns ``S_all, v_all`` of leading dim ``2N + 1`` where entry ``2t``
    is the value function at time t (before the control of step t) and
    entry ``2t + 1`` is the post-control / pre-risk boundary.
    """
    # In reverse mode associative_scan calls fn(later, earlier); our
    # combine signature is (earlier, later), so swap.
    suffix = lax.associative_scan(lambda a, b: combine(b, a), elements,
                                  reverse=True, axis=0)
    return suffix.J, suffix.eta


def _per_step(approx: Approximation, theta: Array, mu: Array,
              S_next: Array, v_next: Array,
              L_traj: Optional[Array], dl_traj: Optional[Array]):
    """Phase 2: per-step gains/scalars from the known suffix values —
    identical math to the sequential scan body, vectorized over t."""
    optimizing = L_traj is None
    n = approx.A.shape[-1]
    m = approx.B.shape[-1]
    dtype = approx.A.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    theta_is_zero = theta == 0.0
    theta_safe = jnp.where(theta_is_zero, jnp.ones((), dtype), theta)

    def step(q, q_vec, Q, r, R, P, A, B, W, W_inv, logdet_W, S, v, L, dl):
        M = _sym(W_inv - theta * S)
        M_chol = smallmat.cholesky(M)
        m_ok = smallmat.chol_ok(M_chol)
        MinvS = smallmat.cho_solve_mat(M_chol, S)
        D = eye_n + theta * MinvS.T
        DS = D @ S
        g = r + B.T @ (D @ v)
        G = P + B.T @ DS @ A
        H = _sym(R + B.T @ DS @ B + mu * eye_m)
        if optimizing:
            H_chol = smallmat.cholesky(H)
            h_ok = smallmat.chol_ok(H_chol)
            L = -smallmat.cho_solve_mat(H_chol, G)
            dl = -smallmat.cho_solve_vec(H_chol, g)
        else:
            h_ok = jnp.ones((), bool)
        Hdl = H @ dl
        ds = q + 0.5 * dl @ Hdl + dl @ g
        Minv_v = smallmat.cho_solve_vec(M_chol, v)
        logdet_M = smallmat.cho_logdet(M_chol)
        risk_neutral = 0.5 * jnp.trace(W @ S)
        risk_sensitive = (0.5 * theta * (v @ Minv_v)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        ds = ds + jnp.where(theta_is_zero, risk_neutral, risk_sensitive)
        return g, G, H, L, dl, ds, m_ok, h_ok

    if optimizing:
        L_in = jnp.zeros((approx.N, m, n), dtype)
        dl_in = jnp.zeros((approx.N, m), dtype)
    else:
        L_in, dl_in = L_traj, dl_traj
    return jax.vmap(step)(approx.q, approx.q_vec, approx.Q, approx.r,
                          approx.R, approx.P, approx.A, approx.B, approx.W,
                          approx.W_inv, approx.logdet_W, S_next, v_next,
                          L_in, dl_in)


def _riccati_core_parallel(approx: Approximation, theta: Array, mu: Array,
                           L_traj: Optional[Array],
                           dl_traj: Optional[Array]):
    """Parallel equivalent of ``riccati._riccati_core``: same outputs."""
    N = approx.N
    m = approx.B.shape[-1]
    dtype = approx.A.dtype
    if dl_traj is None and L_traj is not None:
        dl_traj = jnp.zeros((N, m), dtype)

    elements = _build_elements(approx, theta, mu, L_traj, dl_traj)
    S_all, v_all = _suffix_values(elements)
    # Value function at time boundaries: S_t = S_all[2t]; the gains at step
    # t need S_{t+1} = S_all[2(t+1)] (post-risk boundary of step t is
    # S_all[2t+1], which is the risk transform applied to S_{t+1}).
    S_bound = S_all[::2]            # (N + 1, n, n): S_0 .. S_N
    v_bound = v_all[::2]
    S_next = S_bound[1:]
    v_next = v_bound[1:]

    g, G, H, L, dl, ds, m_ok, h_ok = _per_step(
        approx, theta, mu, S_next, v_next, L_traj, dl_traj)

    # Phase 3: scalar suffix cumsum  s_t = q_term + Σ_{k≥t} ds_k.
    s = approx.q_term + jnp.concatenate(
        [jnp.cumsum(ds[::-1])[::-1], jnp.zeros((1,), dtype)])

    # First failure walking backward (largest failing t); M beats H at the
    # same step — mirrors the sequential latch order.
    t_idx = jnp.arange(N)
    m_fail_t = jnp.where(~m_ok, t_idx, -1)
    h_fail_t = jnp.where(~h_ok, t_idx, -1)
    tm, th_ = jnp.max(m_fail_t), jnp.max(h_fail_t)
    any_fail = (tm >= 0) | (th_ >= 0)
    m_first = any_fail & (tm >= th_)
    h_first = any_fail & ~m_first
    dp = DPResult(s=s, s_vec=v_bound, S=S_bound, g=g, G=G, H=H)
    return dp, L, dl, m_first, h_first


def dp_evaluate_parallel(approx: Approximation, L_traj: Array,
                         dl_traj: Optional[Array] = None, *, theta: Array,
                         mu: Array) -> Tuple[DPResult, Array]:
    """O(log T)-depth policy-evaluating pass ≡ ``riccati.dp_evaluate``."""
    theta = jnp.asarray(theta, approx.A.dtype)
    mu = jnp.asarray(mu, approx.A.dtype)
    dp, _, _, m_fail, _ = _riccati_core_parallel(approx, theta, mu, L_traj,
                                                 dl_traj)
    return dp, m_fail


def dp_optimize_parallel(approx: Approximation, *, theta: Array, mu: Array,
                         delta: Array, mu_min: float, delta_0: float,
                         max_restarts: int = MAX_MU_RESTARTS
                         ) -> Tuple[DPResult, Array, Array, Array, Array,
                                    Array]:
    """O(log T)-depth policy-optimizing pass ≡ ``riccati.dp_optimize``
    (including the μ-restart retry loop around the whole pass)."""
    dtype = approx.A.dtype
    theta = jnp.asarray(theta, dtype)
    mu = jnp.asarray(mu, dtype)
    delta = jnp.asarray(delta, dtype)

    def run(mu_v):
        return _riccati_core_parallel(approx, theta, mu_v, None, None)

    return mu_restart_loop(run, mu, delta, mu_min, delta_0, max_restarts)
