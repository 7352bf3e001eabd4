"""Closed-form small-matrix linear algebra (unrolled, branch-free).

The Riccati recursion factorizes and solves n×n / m×m SPD matrices with
n, m ∈ {2..13} at every backward step.  XLA's `cholesky`/`triangular_solve`
are *custom calls* — unfusable kernel boundaries that dominate the scan at
~30 μs of per-op overhead each on the tunneled TPU runtime (measured:
T=100 optimizing pass = 102 ms at B=1024).  These unrolled element-wise
formulas (static Python loops over the small dimension) compile to plain
VPU arithmetic that XLA fuses across the whole Riccati step — and across
time steps when the scan is unrolled.

All functions operate on arrays with the small matrix in the LAST axes and
broadcast over arbitrary leading batch axes.  PSD failure surfaces as NaN
(sqrt of a negative) — detected downstream exactly like the XLA-Cholesky
NaN convention the solver already relies on.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def cholesky(M: Array) -> Array:
    """Lower-triangular Cholesky factor of ``M`` (..., n, n), unrolled.

    Equivalent to ``jnp.linalg.cholesky`` for SPD inputs; NaN on failure.
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = M[..., i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(acc)
            else:
                L[i][j] = acc / L[j][j]
    z = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else z for j in range(n)], -1)
            for i in range(n)]
    return jnp.stack(rows, -2)


def solve_triangular_lower(L: Array, b: Array) -> Array:
    """Solve ``L y = b`` with ``L`` lower-triangular (..., n, n),
    ``b`` (..., n)."""
    n = L.shape[-1]
    y = [None] * n
    for i in range(n):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[..., i, k] * y[k]
        y[i] = acc / L[..., i, i]
    return jnp.stack(y, -1)


def solve_triangular_upper_T(L: Array, y: Array) -> Array:
    """Solve ``Lᵀ x = y`` with ``L`` lower-triangular (..., n, n)."""
    n = L.shape[-1]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[..., i]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i] * x[k]
        x[i] = acc / L[..., i, i]
    return jnp.stack(x, -1)


def cho_solve_vec(L: Array, b: Array) -> Array:
    """``M⁻¹ b`` from the Cholesky factor ``L`` of ``M``; ``b`` (..., n)."""
    return solve_triangular_upper_T(L, solve_triangular_lower(L, b))


def cho_solve_mat(L: Array, B: Array) -> Array:
    """``M⁻¹ B`` from the Cholesky factor ``L``; ``B`` (..., n, p) solved
    column-by-column (p static and small)."""
    p = B.shape[-1]
    cols = [cho_solve_vec(L, B[..., :, j]) for j in range(p)]
    return jnp.stack(cols, -1)


def cho_inverse(L: Array) -> Array:
    """``M⁻¹`` from the Cholesky factor ``L`` of ``M`` (..., n, n)."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    cols = [cho_solve_vec(L, jnp.broadcast_to(eye[:, j], L.shape[:-2] + (n,)))
            for j in range(n)]
    return jnp.stack(cols, -1)


def cho_logdet(L: Array) -> Array:
    """``log det M = 2 Σ log L_ii`` from the Cholesky factor."""
    diag = jnp.stack([L[..., i, i] for i in range(L.shape[-1])], -1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def chol_ok(L: Array) -> Array:
    """Positive-definiteness test on the Cholesky factor.

    Matches Julia ``isposdef`` semantics (``ileqg.jl:366,372``): every
    diagonal pivot must be finite AND strictly positive.  Finiteness alone
    is not enough — an exactly-singular PSD matrix whose zero pivot lands in
    the LAST diagonal entry produces a finite factor (no later column exists
    for the NaN to poison), yet ``isposdef`` rejects it and downstream
    triangular solves would divide by zero.
    """
    diag = jnp.stack([L[..., i, i] for i in range(L.shape[-1])], -1)
    return jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)


def sym(M: Array) -> Array:
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def mm(A: Array, B: Array) -> Array:
    """Unrolled small-matrix product ``A @ B`` for (..., p, q) × (..., q, r).

    Emits pure elementwise multiply/adds over the static small dims — no
    ``dot_general``.  Under a large ``vmap`` lane axis XLA lowers batched
    tiny ``dot_general``s through MXU-shaped paths that cost an order of
    magnitude more than the equivalent VPU elementwise ops (measured: the
    closed-loop fold inside the rollout scan, 4× on a warm B=65k bank
    solve); every small matmul on a lane-batched hot path should use this.
    """
    p, q = A.shape[-2], A.shape[-1]
    r = B.shape[-1]
    rows = [jnp.stack([sum(A[..., i, k] * B[..., k, j] for k in range(q))
                       for j in range(r)], -1) for i in range(p)]
    return jnp.stack(rows, -2)


def mv(A: Array, v: Array) -> Array:
    """Unrolled small matrix-vector product for (..., p, q) × (..., q)."""
    p, q = A.shape[-2], A.shape[-1]
    return jnp.stack([sum(A[..., i, k] * v[..., k] for k in range(q))
                      for i in range(p)], -1)


def mt(A: Array) -> Array:
    """Transpose of the trailing two dims."""
    return jnp.swapaxes(A, -1, -2)
