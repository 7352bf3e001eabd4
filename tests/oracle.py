"""Independent eager-mode oracle for iLEQG, mirroring the reference's
control flow statement-for-statement.

This is the parity baseline standing in for the Julia reference (not
installed in this image): plain Python loops, real exceptions for PSD
failures, mutable state — the exact semantics of ``/root/reference/src/
ileqg.jl`` re-derived from the math — evaluated in float64.  The jitted
scan/mask solver must reproduce its trajectories to tight tolerance
(BASELINE.md: control-sequence MSE < 1e-4 at equal budgets; we assert far
tighter in float64).

Derivatives come from eager JAX AD (the same values ForwardDiff would
produce, since both are exact ADs of the same functions).
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp


class NeuroticBreakdown(Exception):
    pass


def _derivs(problem, k, x, u):
    c = problem.c
    q = float(problem.c(k, jnp.asarray(x), jnp.asarray(u)))
    xj, uj = jnp.asarray(x), jnp.asarray(u)
    q_vec = np.asarray(jax.grad(c, argnums=1)(k, xj, uj))
    Q = np.asarray(jax.hessian(c, argnums=1)(k, xj, uj))
    r = np.asarray(jax.grad(c, argnums=2)(k, xj, uj))
    R = np.asarray(jax.hessian(c, argnums=2)(k, xj, uj))
    P = np.asarray(jax.jacfwd(jax.grad(c, argnums=2), argnums=1)(k, xj, uj))
    A = np.asarray(jax.jacfwd(problem.f, argnums=0)(xj, uj))
    B = np.asarray(jax.jacfwd(problem.f, argnums=1)(xj, uj))
    W = np.asarray(problem.W(k))
    return q, q_vec, 0.5 * (Q + Q.T), r, 0.5 * (R + R.T), P, A, B, W


def _approximate(problem, u_arr, x_arr):
    N = len(u_arr)
    ap = [_derivs(problem, k, x_arr[k], u_arr[k]) for k in range(N)]
    h = problem.h
    xN = jnp.asarray(x_arr[N])
    q_term = float(h(xN))
    q_vec_term = np.asarray(jax.grad(h)(xN))
    Q_term = np.asarray(jax.hessian(h)(xN))
    return ap, (q_term, q_vec_term, 0.5 * (Q_term + Q_term.T))


def _isposdef(M):
    try:
        np.linalg.cholesky(0.5 * (M + M.T))
        return True
    except np.linalg.LinAlgError:
        return False


def _dp(ap, term, theta, mu, L_arr=None, dl_arr=None, solver=None):
    """Backward recursion.  With ``L_arr=None`` it optimizes (mirrors
    ``solve_approximate_dp!`` incl. the μ-restart loop via ``solver``);
    otherwise it evaluates the fixed policy (``solve_approximate_dp``)."""
    N = len(ap)
    n = ap[0][6].shape[0]
    m = ap[0][7].shape[1]
    optimizing = L_arr is None
    while True:
        s = term[0]
        s_vec = term[1].copy()
        S = term[2].copy()
        L_out = [None] * N
        dl_out = [None] * N
        restart = False
        for t in reversed(range(N)):
            q, q_vec, Q, r, R, P, A, B, W = ap[t]
            M = np.linalg.inv(W) - theta * S
            M = 0.5 * (M + M.T)
            if not _isposdef(M):
                raise NeuroticBreakdown(f"M not PSD at t={t}")
            Minv = np.linalg.inv(M)
            D = np.eye(n) + theta * S @ Minv
            g = r + B.T @ D @ s_vec
            G = P + B.T @ (D @ S) @ A
            mu_eff = (solver["mu"] if optimizing else mu)
            H = R + B.T @ (D @ S) @ B + mu_eff * np.eye(m)
            H = 0.5 * (H + H.T)
            if optimizing:
                if not _isposdef(H):
                    # increase_mu_and_delta! + full restart
                    solver["delta"] = max(solver["delta_0"],
                                          solver["delta"] * solver["delta_0"])
                    solver["mu"] = max(solver["mu_min"],
                                       solver["mu"] * solver["delta"])
                    restart = True
                    break
                L = -np.linalg.solve(H, G)
                dl = -np.linalg.solve(H, g)
            else:
                L = L_arr[t]
                dl = (np.zeros(m) if dl_arr is None else dl_arr[t])
            L_out[t] = L
            dl_out[t] = dl
            s_new = q + s + 0.5 * dl @ H @ dl + dl @ g
            if theta == 0.0:
                s_new += 0.5 * np.trace(W @ S)
            else:
                s_new += (theta / 2 * s_vec @ Minv @ s_vec
                          - 1.0 / (2 * theta) * math.log(
                              np.linalg.det(W @ M)))
            s_vec = (q_vec + A.T @ D @ s_vec + L.T @ H @ dl + L.T @ g
                     + G.T @ dl)
            S = Q + A.T @ (D @ S) @ A + L.T @ H @ L + L.T @ G + G.T @ L
            S = 0.5 * (S + S.T)
            s = s_new
        if not restart:
            return s, L_out, dl_out


def _rollout(problem, x0, u_arr):
    x = [np.asarray(x0, float)]
    for u in u_arr:
        x.append(np.asarray(problem.f(jnp.asarray(x[-1]), jnp.asarray(u))))
    return x


def _rollout_feedback(problem, x_ref, l_arr, L_arr):
    x = [x_ref[0].copy()]
    u_out = []
    for t in range(len(l_arr)):
        u = l_arr[t] + L_arr[t] @ (x[t] - x_ref[t])
        u_out.append(u)
        x.append(np.asarray(problem.f(jnp.asarray(x[t]), jnp.asarray(u))))
    return x, u_out


def oracle_solve(problem, x0, u_init, theta, *, mu_min=1e-6, delta_0=2.0,
                 lam=0.5, d_tol=1e-2, iter_max=100, eps_init=1.0,
                 adaptive_eps_init=False, eps_min=1e-6):
    """Mirror of ``solve!`` (``ileqg.jl:635-659``).  Raises
    :class:`NeuroticBreakdown` exactly where the reference's asserts throw.

    Returns ``(x_arr (N+1,n), l_arr (N,m), L_arr (N,m,n), value,
    eps_history)``.
    """
    N = len(u_init)
    solver = {"mu": 0.0, "delta": delta_0, "mu_min": mu_min,
              "delta_0": delta_0}
    x_arr = _rollout(problem, x0, u_init)
    l_arr = [np.asarray(u, float).copy() for u in u_init]
    L_arr = [np.zeros((len(u_init[0]), len(x0))) for _ in range(N)]
    ap, term = _approximate(problem, l_arr, x_arr)
    value, _, _ = _dp(ap, term, theta, 0.0, L_arr, None)
    eps_history = []
    eps_init_cur = eps_init
    d_current = math.inf
    it = 0
    while True:
        it += 1
        ap, term = _approximate(problem, l_arr, x_arr)
        _, L_new, dl_new = _dp(ap, term, theta, None, None, None, solver)
        L_arr = L_new
        # line search (ileqg.jl:494-592)
        eps = eps_init_cur
        count = 0
        while True:
            count += 1
            l_cand = [l_arr[t] + eps * dl_new[t] for t in range(N)]
            x_new, u_new = _rollout_feedback(problem, x_arr, l_cand, L_arr)
            ap_new, term_new = _approximate(problem, u_new, x_new)
            try:
                value_new, _, _ = _dp(ap_new, term_new, theta,
                                      solver["mu"], L_arr, None)
            except NeuroticBreakdown:
                eps *= lam
                continue
            eps_history.append((eps, value_new - value))
            approx_eq = math.isclose(value_new, value,
                                     rel_tol=math.sqrt(np.finfo(float).eps))
            if approx_eq or value_new < value:
                d_current = max(np.linalg.norm(l_arr[t] - u_new[t])
                                for t in range(N))
                value, x_arr, l_arr = value_new, x_new, u_new
                break
            eps *= lam
            if eps < eps_min:
                d_current = max(np.linalg.norm(l_arr[t] - u_new[t])
                                for t in range(N))
                value, x_arr, l_arr = value_new, x_new, u_new
                break
        if adaptive_eps_init:
            if count == 1:
                eps_init_cur = min(eps_init, eps / lam)
            else:
                while eps < eps_min:
                    eps /= lam
                eps_init_cur = eps
        if d_tol > d_current and solver["mu"] <= mu_min:
            break
        if it == iter_max:
            break
    return (np.stack(x_arr), np.stack(l_arr), np.stack(L_arr), value,
            eps_history)
