"""Pallas TPU kernel: fused batched risk-sensitive Riccati backward pass.

The Riccati recursion is the numerical heart of every solver in this
framework (``ops/riccati.py``, mirroring ``ileqg.jl:328-488``).  The XLA
path runs it as a ``lax.scan`` of small batched ops; this kernel fuses the
*entire* backward pass — all T steps of the small-matrix algebra, for a
whole bank of lanes — into a single Mosaic program:

  - **Layout**: lane-last.  Every matrix element is an ``(8, 128)`` float32
    tile (one full VPU register) holding 1024 bank lanes; matrices are
    ``(n, n, 8, 128)`` blocks.  All algebra (matmuls, Cholesky, triangular
    solves) unrolls over the small static dims as element-wise VPU ops —
    the same closed-form formulas as ``ops/smallmat.py``.
  - **Grid**: ``(lane_tiles, T)``.  The time dimension walks *backward*
    via the BlockSpec index map; the value-function carry ``(s, s⃗, S)``
    and the latched failure masks live in VMEM scratch that persists
    across grid steps, while Pallas double-buffers the per-step input
    slices HBM→VMEM.
  - **Failure semantics**: identical to the scan path — the first failed
    Cholesky (M → neurotic breakdown, H → μ-restart request) latches a
    per-lane mask; NaNs thereafter are don't-cares.

The kernel handles both the policy-optimizing pass (``solve_approximate_
dp!``) and the policy-evaluating pass (``solve_approximate_dp``) via a
static flag.

The workload is HBM-bound at arithmetic intensity ≈2 FLOP/B
(docs/performance.md "Speed of light"), so the kernel's cost is set by
what it streams.  Three traffic reductions beyond the baseline layout:

  - **slim outputs** (``slim=True``): the solver's hot path consumes only
    ``(value, L, dl, fails)`` from the optimizing pass and ``(value,
    fails)`` from the evaluating pass (``solvers/ileqg.py``); slim mode
    skips writing the unused per-step ``s/s⃗/S/g/G/H`` stacks — 25 of the
    33 output floats/step/lane.
  - **no zero streams**: the optimizing pass takes no ``L_in/dl_in``
    inputs at all (the old kernel streamed 8 floats/step/lane of zeros),
    and the evaluating pass streams ``dl_in`` only when the caller has one.
  - **shared noise model in SMEM**: ``W/W⁻¹/logdet W`` depend only on the
    problem, not the lane; when the caller passes them *unbatched*
    (``(T, n, n)`` instead of ``(B, T, n, n)``) they are streamed once per
    time step into SMEM as scalars — 19 per-lane floats/step become 19
    *total* floats/step, and the bank-side broadcast materialization
    disappears entirely.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE_TILE = (8, 128)
LANES = LANE_TILE[0] * LANE_TILE[1]   # 1024 bank lanes per grid row


# --- tiny-matrix algebra on (p, q, 8, 128) lane-tiled blocks -------------

def _mat(rows):
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def _mmul(a: Array, b: Array) -> Array:
    """(p, q, 8, 128) @ (q, r, 8, 128) -> (p, r, 8, 128), unrolled."""
    p, q = a.shape[0], a.shape[1]
    r = b.shape[1]
    return _mat([[sum(a[i, k] * b[k, j] for k in range(q))
                  for j in range(r)] for i in range(p)])


def _mvec(a: Array, v: Array) -> Array:
    """(p, q, 8, 128) @ (q, 8, 128) -> (p, 8, 128)."""
    p, q = a.shape[0], a.shape[1]
    return jnp.stack([sum(a[i, k] * v[k] for k in range(q))
                      for i in range(p)], 0)


def _t(a: Array) -> Array:
    return jnp.swapaxes(a, 0, 1)


def _sym(a: Array) -> Array:
    return 0.5 * (a + _t(a))


def _dot(u: Array, v: Array) -> Array:
    """(q, 8, 128) · (q, 8, 128) -> (8, 128)."""
    return sum(u[k] * v[k] for k in range(u.shape[0]))


def _chol(M: Array) -> Array:
    """Closed-form Cholesky on a (n, n, 8, 128) block (NaN on failure)."""
    n = M.shape[0]
    L = [[None] * n for _ in range(n)]
    z = jnp.zeros_like(M[0, 0])
    for i in range(n):
        for j in range(i + 1):
            acc = M[i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = jnp.sqrt(acc) if i == j else acc / L[j][j]
    return _mat([[L[i][j] if j <= i else z for j in range(n)]
                 for i in range(n)])


def _chol_ok_mask(L: Array) -> Array:
    """(8, 128) boolean mask: positive-definite on this lane.

    Matches smallmat.chol_ok — every pivot finite AND strictly positive
    (a zero last pivot yields a finite factor but isposdef rejects it).
    """
    n = L.shape[0]
    ok = jnp.isfinite(L[0][0]) & (L[0][0] > 0)
    for i in range(1, n):
        ok = ok & jnp.isfinite(L[i][i]) & (L[i][i] > 0)
    return ok


def _rinv_diag(L: Array):
    """Reciprocals of the Cholesky diagonal, computed ONCE per factor.

    Cuts the per-step divide count ~48 → ~10 at n=3, m=2 (the
    substitution loops divide by ``L[i, i]`` 2k times per solve column).
    Measured effect on the kernel: NEUTRAL — a same-process interleaved
    A/B vs the division form at B=8192, T=100 read 321 vs 326 µs/call
    (within the ±15 µs round spread), so Mosaic's f32 divide is not a
    multi-op bottleneck at this mix.  Kept because it is byte-identical
    in shape, ≤1 ulp in value, and marginally fewer ops; the real floor
    analysis lives in docs/performance.md "Where the other 40% goes"
    (benchmarks/dp_roofline_audit.json: the kernel runs at the SUM of
    its HBM and unit-op VPU bounds — both near their physical limits —
    with the full−slim byte contrast streaming at 610+ GB/s).
    """
    n = L.shape[0]
    return [1.0 / L[i, i] for i in range(n)]


def _cho_solve_vec(L: Array, b: Array, rinv=None) -> Array:
    """M⁻¹ b via forward+back substitution; b is (n, 8, 128)."""
    n = L.shape[0]
    if rinv is None:
        rinv = _rinv_diag(L)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i, k] * y[k]
        y[i] = acc * rinv[i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k, i] * x[k]
        x[i] = acc * rinv[i]
    return jnp.stack(x, 0)


def _cho_solve_mat(L: Array, B: Array, rinv=None) -> Array:
    """M⁻¹ B column-by-column; B is (n, p, 8, 128)."""
    if rinv is None:
        rinv = _rinv_diag(L)
    p = B.shape[1]
    return jnp.stack([_cho_solve_vec(L, B[:, j], rinv) for j in range(p)],
                     1)


def _cho_logdet(L: Array) -> Array:
    n = L.shape[0]
    return 2.0 * sum(jnp.log(L[i, i]) for i in range(n))


def _trace_prod(A: Array, B: Array) -> Array:
    """tr(A @ B) for (n, n, 8, 128) blocks."""
    n = A.shape[0]
    return sum(A[i, j] * B[j, i] for i in range(n) for j in range(n))


# --- the kernel ----------------------------------------------------------

class _Cfg(NamedTuple):
    """Static kernel configuration (one compiled variant per value)."""
    optimizing: bool
    slim: bool
    w_shared: bool   # W/W_inv/logdet_W lane-invariant, streamed via SMEM
    has_dl: bool     # evaluating mode only: a dl_in stream exists


def _riccati_kernel(cfg: _Cfg, *refs):
    it = iter(refs)
    q_ref, qv_ref, Q_ref, r_ref, R_ref, P_ref, A_ref, B_ref = (
        next(it) for _ in range(8))
    W_ref, Wi_ref, ldW_ref = (next(it) for _ in range(3))
    qT_ref, qvT_ref, QT_ref, theta_ref, mu_ref = (
        next(it) for _ in range(5))
    L_in_ref = dl_in_ref = None
    if not cfg.optimizing:
        L_in_ref = next(it)
        if cfg.has_dl:
            dl_in_ref = next(it)
    if cfg.slim:
        if cfg.optimizing:
            val_ref, L_ref, dl_ref, mfail_ref, hfail_ref = (
                next(it) for _ in range(5))
        else:
            val_ref, mfail_ref, hfail_ref = (next(it) for _ in range(3))
    else:
        (s_ref, svec_ref, S_ref, g_ref, G_ref, H_ref, L_ref, dl_ref,
         mfail_ref, hfail_ref) = (next(it) for _ in range(10))
    S_sc, svec_sc, s_sc, mfail_sc, hfail_sc = (next(it) for _ in range(5))

    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        S_sc[...] = QT_ref[...]
        svec_sc[...] = qvT_ref[...]
        s_sc[...] = qT_ref[...]
        mfail_sc[...] = jnp.zeros_like(mfail_sc)
        hfail_sc[...] = jnp.zeros_like(hfail_sc)

    theta = theta_ref[...]
    mu = mu_ref[...]
    theta_is_zero = theta == 0.0
    theta_safe = jnp.where(theta_is_zero, jnp.ones_like(theta), theta)

    S = S_sc[...]
    s_vec = svec_sc[...]
    s = s_sc[...]
    m_fail = mfail_sc[...]
    h_fail = hfail_sc[...]
    failed = (m_fail + h_fail) > 0.0

    q = q_ref[...]
    q_vec = qv_ref[...]
    Q = Q_ref[...]
    r = r_ref[...]
    R = R_ref[...]
    P = P_ref[...]
    A = A_ref[...]
    B = B_ref[...]

    n = A.shape[0]
    m = B.shape[1]

    # M = W⁻¹ − θ S'  (ileqg.jl:365).  With a shared noise model, W-terms
    # are SMEM scalars broadcast against the lane tiles.
    if cfg.w_shared:
        M = _sym(_mat([[Wi_ref[i, j] - theta * S[i, j] for j in range(n)]
                       for i in range(n)]))
    else:
        M = _sym(Wi_ref[...] - theta[None, None] * S)
    M_chol = _chol(M)
    rinv_M = _rinv_diag(M_chol)
    m_ok = _chol_ok_mask(M_chol)
    m_fail = jnp.where(~failed & ~m_ok, 1.0, m_fail)

    # D = I + θ S' M⁻¹ = I + θ (M⁻¹ S')ᵀ
    MinvS = _cho_solve_mat(M_chol, S, rinv_M)
    eye_b = [[jnp.where(jnp.bool_(i == j), jnp.ones_like(theta),
                        jnp.zeros_like(theta)) for j in range(n)]
             for i in range(n)]
    D = _mat(eye_b) + theta[None, None] * _t(MinvS)
    DS = _mmul(D, S)

    Bt = _t(B)
    g = r + _mvec(Bt, _mvec(D, s_vec))                 # ileqg.jl:368
    G = P + _mmul(_mmul(Bt, DS), A)                    # ileqg.jl:369
    eye_m = _mat([[jnp.where(jnp.bool_(i == j), mu, jnp.zeros_like(mu))
                   for j in range(m)] for i in range(m)])
    H = _sym(R + _mmul(_mmul(Bt, DS), B) + eye_m)      # ileqg.jl:370-371

    if cfg.optimizing:
        H_chol = _chol(H)
        rinv_H = _rinv_diag(H_chol)
        h_ok = _chol_ok_mask(H_chol)
        h_fail = jnp.where(~failed & ~(m_fail > 0) & ~h_ok, 1.0, h_fail)
        L = -_cho_solve_mat(H_chol, G, rinv_H)         # ileqg.jl:379
        dl = -_cho_solve_vec(H_chol, g, rinv_H)        # ileqg.jl:381
    else:
        L = L_in_ref[...]
        dl = (dl_in_ref[...] if cfg.has_dl
              else jnp.zeros((m,) + theta.shape, theta.dtype))

    Hdl = _mvec(H, dl)
    s_new = q + s + 0.5 * _dot(dl, Hdl) + _dot(dl, g)  # ileqg.jl:383
    Minv_svec = _cho_solve_vec(M_chol, s_vec, rinv_M)
    logdet_M = _cho_logdet(M_chol)
    if cfg.w_shared:
        risk_neutral = 0.5 * sum(W_ref[i, j] * S[j, i]
                                 for i in range(n) for j in range(n))
        logdet_W = ldW_ref[0, 0]
    else:
        risk_neutral = 0.5 * _trace_prod(W_ref[...], S)
        logdet_W = ldW_ref[...]
    risk_sensitive = (0.5 * theta * _dot(s_vec, Minv_svec)
                      - (logdet_W + logdet_M) / (2.0 * theta_safe))
    s_new = s_new + jnp.where(theta_is_zero, risk_neutral, risk_sensitive)

    Lt = _t(L)
    s_vec_new = (q_vec + _mvec(_t(A), _mvec(D, s_vec)) + _mvec(Lt, Hdl)
                 + _mvec(Lt, g) + _mvec(_t(G), dl))    # ileqg.jl:389
    S_new = _sym(Q + _mmul(_mmul(_t(A), DS), A) + _mmul(Lt, _mmul(H, L))
                 + _mmul(Lt, G) + _mmul(_t(G), L))     # ileqg.jl:390-391

    # per-step outputs
    if cfg.slim:
        # value (= s at the last grid step, initial time): written every
        # step to a time-invariant block, last write wins (like the masks).
        val_ref[...] = s_new
        if cfg.optimizing:
            L_ref[...] = L
            dl_ref[...] = dl
    else:
        s_ref[...] = s_new
        svec_ref[...] = s_vec_new
        S_ref[...] = S_new
        g_ref[...] = g
        G_ref[...] = G
        H_ref[...] = H
        L_ref[...] = L
        dl_ref[...] = dl

    # carry
    S_sc[...] = S_new
    svec_sc[...] = s_vec_new
    s_sc[...] = s_new
    mfail_sc[...] = m_fail
    hfail_sc[...] = h_fail

    # final fail masks (written every step; last write wins)
    mfail_ref[...] = m_fail
    hfail_ref[...] = h_fail


class BankDP(NamedTuple):
    """Lane-batched DP result (leading axis = bank lane)."""
    s: Array       # (B, T)      backward values s_t (t = 0..T-1)
    s_vec: Array   # (B, T, n)
    S: Array       # (B, T, n, n)
    g: Array       # (B, T, m)
    G: Array       # (B, T, m, n)
    H: Array       # (B, T, m, m)
    L: Array       # (B, T, m, n)
    dl: Array      # (B, T, m)
    m_fail: Array  # (B,) bool
    h_fail: Array  # (B,) bool


class BankSlim(NamedTuple):
    """Slim lane-batched DP result — only what the solver hot path reads."""
    value: Array             # (B,)  cost-to-go at the initial time
    L: Optional[Array]       # (B, T, m, n); None in evaluating mode
    dl: Optional[Array]      # (B, T, m);    None in evaluating mode
    m_fail: Array            # (B,) bool
    h_fail: Array            # (B,) bool


def _to_lanes(x: Array, B_pad: int) -> Array:
    """(B, T, *dims) -> (T, *dims, tiles, 8, 128) lane-last layout."""
    B = x.shape[0]
    if B_pad != B:
        pad = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    # (B_pad, T, *d) -> (T, *d, B_pad)
    x = jnp.moveaxis(x, 0, -1)
    tiles = B_pad // LANES
    return x.reshape(x.shape[:-1] + (tiles, LANE_TILE[0], LANE_TILE[1]))


def _from_lanes(x: Array, B: int) -> Array:
    """(T, *dims, tiles, 8, 128) -> (B, T, *dims)."""
    x = x.reshape(x.shape[:-3] + (-1,))
    x = jnp.moveaxis(x, -1, 0)
    return x[:B]


def riccati_bank(approx_b, theta: Array, mu: Array,
                 L_in: Optional[Array] = None,
                 dl_in: Optional[Array] = None, *, slim: bool = False):
    """Run the fused backward pass for a whole bank.

    Args:
      approx_b: an ``Approximation`` pytree with a leading bank axis ``B``
        on every field (including the terminal entries) — except that
        ``W``/``W_inv``/``logdet_W`` MAY be passed unbatched
        (``(T, n, n)``/``(T,)``) when the noise model is lane-invariant;
        they are then streamed through SMEM once per step instead of once
        per lane per step.
      theta, mu: ``(B,)`` per-lane parameters.
      L_in, dl_in: fixed policy for the evaluating mode (``(B, T, m, n)`` /
        ``(B, T, m)``); ``None`` → optimizing mode.  ``dl_in=None`` with
        ``L_in`` given evaluates the pure-feedback policy (dl ≡ 0) without
        streaming zeros.
      slim: write only the outputs the solver consumes — optimizing:
        ``(value, L, dl, fails)``; evaluating: ``(value, fails)`` — as a
        :class:`BankSlim`.  ``slim=False`` returns the full
        :class:`BankDP`.

    Lanes are padded up to a multiple of 1024 (8×128 VPU tiles); padded
    lanes compute garbage that is sliced away.
    """
    optimizing = L_in is None
    has_dl = (not optimizing) and (dl_in is not None)
    w_shared = approx_b.W.ndim == 3
    assert (approx_b.W_inv.ndim == approx_b.W.ndim
            and approx_b.logdet_W.ndim == approx_b.W.ndim - 2), \
        "W/W_inv/logdet_W must be consistently batched or consistently not"
    B, T = approx_b.q.shape[0], approx_b.q.shape[1]
    n = approx_b.A.shape[-1]
    m = approx_b.B.shape[-1]
    dtype = approx_b.A.dtype
    B_pad = max(LANES, ((B + LANES - 1) // LANES) * LANES)
    tiles = B_pad // LANES

    def prep(x):
        return _to_lanes(jnp.asarray(x, dtype), B_pad)

    S8, L8 = LANE_TILE

    def bspec(*dims, time=True):
        """VMEM BlockSpec walking one t-slice per grid step (backward).

        ``None`` block entries squeeze the singleton time/tile axes so the
        kernel sees plain ``(*dims, 8, 128)`` blocks."""
        if time:
            blk = (None,) + dims + (None, S8, L8)

            def imap(bi, ti):
                return (T - 1 - ti,) + (0,) * len(dims) + (bi, 0, 0)
        else:
            blk = dims + (None, S8, L8)

            def imap(bi, ti):
                return (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def sspec(*dims):
        """SMEM BlockSpec for lane-invariant per-step data."""
        blk = (None,) + dims

        def imap(bi, ti):
            return (T - 1 - ti,) + (0,) * len(dims)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.SMEM)

    # --- inputs ---------------------------------------------------------
    inputs = [prep(approx_b.q), prep(approx_b.q_vec), prep(approx_b.Q),
              prep(approx_b.r), prep(approx_b.R), prep(approx_b.P),
              prep(approx_b.A), prep(approx_b.B)]
    in_specs = [bspec(), bspec(n), bspec(n, n), bspec(m), bspec(m, m),
                bspec(m, n), bspec(n, n), bspec(n, m)]

    if w_shared:
        inputs += [jnp.asarray(approx_b.W, dtype),
                   jnp.asarray(approx_b.W_inv, dtype),
                   jnp.asarray(approx_b.logdet_W, dtype).reshape(T, 1, 1)]
        in_specs += [sspec(n, n), sspec(n, n), sspec(1, 1)]
    else:
        # Pad W_inv of padded lanes with identity so their Cholesky stays
        # finite (keeps NaN-latching semantics clean even though padded
        # lanes are discarded).
        Wi_full = jnp.asarray(approx_b.W_inv, dtype)
        if B_pad > B:
            eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype),
                                       (B_pad - B, T, n, n))
            Wi_full = jnp.concatenate([Wi_full, eye_pad], axis=0)
        inputs += [prep(approx_b.W), _to_lanes(Wi_full, B_pad),
                   prep(approx_b.logdet_W)]
        in_specs += [bspec(n, n), bspec(n, n), bspec()]

    # terminal entries + per-lane parameters: (B, ...) -> (..., tiles, 8, 128)
    inputs += [_to_lanes(approx_b.q_term[:, None], B_pad)[0],
               _to_lanes(approx_b.q_vec_term[:, None], B_pad)[0],
               _to_lanes(approx_b.Q_term[:, None], B_pad)[0],
               _to_lanes(theta.astype(dtype)[:, None], B_pad)[0],
               _to_lanes(mu.astype(dtype)[:, None], B_pad)[0]]
    in_specs += [bspec(time=False), bspec(n, time=False),
                 bspec(n, n, time=False), bspec(time=False),
                 bspec(time=False)]

    if not optimizing:
        inputs.append(prep(L_in))
        in_specs.append(bspec(m, n))
        if has_dl:
            inputs.append(prep(dl_in))
            in_specs.append(bspec(m))

    # --- outputs --------------------------------------------------------
    if slim:
        if optimizing:
            out_shapes = (
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),           # val
                jax.ShapeDtypeStruct((T, m, n, tiles, S8, L8), dtype),  # L
                jax.ShapeDtypeStruct((T, m, tiles, S8, L8), dtype),     # dl
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),        # m_fail
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),        # h_fail
            )
            out_specs = (bspec(time=False), bspec(m, n), bspec(m),
                         bspec(time=False), bspec(time=False))
        else:
            out_shapes = (
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),           # val
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),        # m_fail
                jax.ShapeDtypeStruct((tiles, S8, L8), dtype),        # h_fail
            )
            out_specs = (bspec(time=False), bspec(time=False),
                         bspec(time=False))
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((T, tiles, S8, L8), dtype),            # s
            jax.ShapeDtypeStruct((T, n, tiles, S8, L8), dtype),         # s_vec
            jax.ShapeDtypeStruct((T, n, n, tiles, S8, L8), dtype),      # S
            jax.ShapeDtypeStruct((T, m, tiles, S8, L8), dtype),         # g
            jax.ShapeDtypeStruct((T, m, n, tiles, S8, L8), dtype),      # G
            jax.ShapeDtypeStruct((T, m, m, tiles, S8, L8), dtype),      # H
            jax.ShapeDtypeStruct((T, m, n, tiles, S8, L8), dtype),      # L
            jax.ShapeDtypeStruct((T, m, tiles, S8, L8), dtype),         # dl
            jax.ShapeDtypeStruct((tiles, S8, L8), dtype),               # m_fail
            jax.ShapeDtypeStruct((tiles, S8, L8), dtype),               # h_fail
        )
        out_specs = (
            bspec(), bspec(n), bspec(n, n), bspec(m), bspec(m, n),
            bspec(m, m), bspec(m, n), bspec(m),
            bspec(time=False), bspec(time=False),
        )

    scratch = [
        pltpu.VMEM((n, n, S8, L8), dtype),   # S carry
        pltpu.VMEM((n, S8, L8), dtype),      # s_vec carry
        pltpu.VMEM((S8, L8), dtype),         # s carry
        pltpu.VMEM((S8, L8), dtype),         # m_fail mask
        pltpu.VMEM((S8, L8), dtype),         # h_fail mask
    ]

    cfg = _Cfg(optimizing=optimizing, slim=slim, w_shared=w_shared,
               has_dl=has_dl)
    call = pl.pallas_call(
        functools.partial(_riccati_kernel, cfg),
        grid=(tiles, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )
    # Under jax_enable_x64 the grid/index machinery traces with i64, which
    # Mosaic cannot legalize; the kernel itself is pure f32/i32, so trace
    # it with x64 locally disabled.
    with jax.enable_x64(False):
        outs = call(*inputs)

    unl = lambda x: _from_lanes(x, B)
    scalar = lambda x: _from_lanes(x[None], B)[:, 0]
    if slim:
        if optimizing:
            val, L, dl, mfail, hfail = outs
            return BankSlim(value=scalar(val), L=unl(L), dl=unl(dl),
                            m_fail=scalar(mfail) > 0,
                            h_fail=scalar(hfail) > 0)
        val, mfail, hfail = outs
        return BankSlim(value=scalar(val), L=None, dl=None,
                        m_fail=scalar(mfail) > 0, h_fail=scalar(hfail) > 0)

    s, s_vec, S, g, G, H, L, dl, mfail, hfail = outs
    return BankDP(s=unl(s), s_vec=unl(s_vec), S=unl(S), g=unl(g), G=unl(G),
                  H=unl(H), L=unl(L), dl=unl(dl),
                  m_fail=scalar(mfail) > 0, h_fail=scalar(hfail) > 0)


def _use_interpret() -> bool:
    """Interpret mode off-TPU (CPU tests); compiled Mosaic on TPU."""
    return jax.default_backend() not in ("tpu", "axon")


# --- folded evaluating kernel --------------------------------------------

def _riccati_folded_kernel(w_shared: bool, *refs):
    """Value-only evaluating pass over a closed-loop-FOLDED stack
    (``ops/approx.FoldedApprox``): per step reads only
    ``(q, q̄_vec, Q̄, Ā)`` = 22 floats/lane — the ``dl = 0`` fixed-policy
    recursion needs neither the control blocks nor L/μ (algebra in the
    FoldedApprox docstring; semantics = ``ileqg.jl:412-465`` with zero
    offsets).  Same closed-form block algebra and failure latching as
    ``_riccati_kernel``'s evaluating mode."""
    it = iter(refs)
    q_ref, qv_ref, Q_ref, A_ref = (next(it) for _ in range(4))
    W_ref, Wi_ref, ldW_ref = (next(it) for _ in range(3))
    qT_ref, qvT_ref, QT_ref, theta_ref = (next(it) for _ in range(4))
    val_ref, mfail_ref = (next(it) for _ in range(2))
    S_sc, svec_sc, s_sc, mfail_sc = (next(it) for _ in range(4))

    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        S_sc[...] = QT_ref[...]
        svec_sc[...] = qvT_ref[...]
        s_sc[...] = qT_ref[...]
        mfail_sc[...] = jnp.zeros_like(mfail_sc)

    theta = theta_ref[...]
    theta_is_zero = theta == 0.0
    theta_safe = jnp.where(theta_is_zero, jnp.ones_like(theta), theta)

    S = S_sc[...]
    s_vec = svec_sc[...]
    s = s_sc[...]
    m_fail = mfail_sc[...]

    q = q_ref[...]
    q_vec = qv_ref[...]
    Q = Q_ref[...]
    A = A_ref[...]
    n = A.shape[0]

    if w_shared:
        M = _sym(_mat([[Wi_ref[i, j] - theta * S[i, j] for j in range(n)]
                       for i in range(n)]))
    else:
        M = _sym(Wi_ref[...] - theta[None, None] * S)
    M_chol = _chol(M)
    rinv_M = _rinv_diag(M_chol)
    m_fail = jnp.where(~_chol_ok_mask(M_chol), 1.0, m_fail)

    MinvS = _cho_solve_mat(M_chol, S, rinv_M)
    eye_b = [[jnp.where(jnp.bool_(i == j), jnp.ones_like(theta),
                        jnp.zeros_like(theta)) for j in range(n)]
             for i in range(n)]
    D = _mat(eye_b) + theta[None, None] * _t(MinvS)
    DS = _mmul(D, S)

    s_new = q + s
    Minv_svec = _cho_solve_vec(M_chol, s_vec, rinv_M)
    logdet_M = _cho_logdet(M_chol)
    if w_shared:
        risk_neutral = 0.5 * sum(W_ref[i, j] * S[j, i]
                                 for i in range(n) for j in range(n))
        logdet_W = ldW_ref[0, 0]
    else:
        risk_neutral = 0.5 * _trace_prod(W_ref[...], S)
        logdet_W = ldW_ref[...]
    risk_sensitive = (0.5 * theta * _dot(s_vec, Minv_svec)
                      - (logdet_W + logdet_M) / (2.0 * theta_safe))
    s_new = s_new + jnp.where(theta_is_zero, risk_neutral, risk_sensitive)

    At = _t(A)
    s_vec_new = q_vec + _mvec(At, _mvec(D, s_vec))
    S_new = _sym(Q + _mmul(_mmul(At, DS), A))

    val_ref[...] = s_new
    mfail_ref[...] = m_fail

    S_sc[...] = S_new
    svec_sc[...] = s_vec_new
    s_sc[...] = s_new
    mfail_sc[...] = m_fail


class BankFolded(NamedTuple):
    """Lane-batched folded-evaluation result."""
    value: Array   # (B,)
    m_fail: Array  # (B,) bool


def riccati_bank_folded(fa, theta: Array) -> BankFolded:
    """Fused folded evaluating pass for a whole bank (value-only).

    ``fa`` is a ``FoldedApprox`` with a leading bank axis on every field
    except (optionally) the lane-invariant noise model, which streams via
    SMEM exactly as in :func:`riccati_bank`.
    """
    w_shared = fa.W.ndim == 3
    B, T = fa.q.shape[0], fa.q.shape[1]
    n = fa.A.shape[-1]
    dtype = fa.A.dtype
    B_pad = max(LANES, ((B + LANES - 1) // LANES) * LANES)
    tiles = B_pad // LANES

    def prep(x):
        return _to_lanes(jnp.asarray(x, dtype), B_pad)

    S8, L8 = LANE_TILE

    def bspec(*dims, time=True):
        if time:
            blk = (None,) + dims + (None, S8, L8)

            def imap(bi, ti):
                return (T - 1 - ti,) + (0,) * len(dims) + (bi, 0, 0)
        else:
            blk = dims + (None, S8, L8)

            def imap(bi, ti):
                return (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def sspec(*dims):
        blk = (None,) + dims

        def imap(bi, ti):
            return (T - 1 - ti,) + (0,) * len(dims)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.SMEM)

    inputs = [prep(fa.q), prep(fa.q_vec), prep(fa.Q), prep(fa.A)]
    in_specs = [bspec(), bspec(n), bspec(n, n), bspec(n, n)]

    if w_shared:
        inputs += [jnp.asarray(fa.W, dtype), jnp.asarray(fa.W_inv, dtype),
                   jnp.asarray(fa.logdet_W, dtype).reshape(T, 1, 1)]
        in_specs += [sspec(n, n), sspec(n, n), sspec(1, 1)]
    else:
        Wi_full = jnp.asarray(fa.W_inv, dtype)
        if B_pad > B:
            eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype),
                                       (B_pad - B, T, n, n))
            Wi_full = jnp.concatenate([Wi_full, eye_pad], axis=0)
        inputs += [prep(fa.W), _to_lanes(Wi_full, B_pad),
                   prep(fa.logdet_W)]
        in_specs += [bspec(n, n), bspec(n, n), bspec()]

    inputs += [_to_lanes(fa.q_term[:, None], B_pad)[0],
               _to_lanes(fa.q_vec_term[:, None], B_pad)[0],
               _to_lanes(fa.Q_term[:, None], B_pad)[0],
               _to_lanes(theta.astype(dtype)[:, None], B_pad)[0]]
    in_specs += [bspec(time=False), bspec(n, time=False),
                 bspec(n, n, time=False), bspec(time=False)]

    out_shapes = (
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),            # value
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),            # m_fail
    )
    out_specs = (bspec(time=False), bspec(time=False))

    scratch = [
        pltpu.VMEM((n, n, S8, L8), dtype),   # S carry
        pltpu.VMEM((n, S8, L8), dtype),      # s_vec carry
        pltpu.VMEM((S8, L8), dtype),         # s carry
        pltpu.VMEM((S8, L8), dtype),         # m_fail mask
    ]

    call = pl.pallas_call(
        functools.partial(_riccati_folded_kernel, w_shared),
        grid=(tiles, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )
    with jax.enable_x64(False):
        val, mfail = call(*inputs)

    scalar = lambda x: _from_lanes(x[None], B)[:, 0]
    return BankFolded(value=scalar(val), m_fail=scalar(mfail) > 0)
