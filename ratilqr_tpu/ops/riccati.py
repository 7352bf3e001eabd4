"""Risk-sensitive Riccati dynamic programming (the numerical heart).

TPU-native counterpart of ``solve_approximate_dp!`` / ``solve_approximate_dp``
and the μ/Δ regularization schedule
(``/root/reference/src/ileqg.jl:328-488``).

Design (SURVEY.md §7 principles 3-4):
  - The backward recursion is a single ``lax.scan`` (reverse over time).
  - Every PSD assert in the reference (``ileqg.jl:366,372,440``) becomes a
    Cholesky-failure *flag* latched through the scan — exceptions become
    masks, so ``vmap`` banks of solves work unmodified and infeasible lanes
    surface as ``cost = Inf`` downstream exactly like the reference's
    catch-to-Inf (``cross_entropy_bilevel_optimization.jl:161-166``).
  - The μ-restart loop (``ileqg.jl:358-401``: restart the whole backward pass
    with larger μ whenever some ``H_t`` is not PSD) becomes a bounded
    ``lax.while_loop`` around the scan.

Failure semantics mirror the reference's scan order exactly: walking backward
from ``t = N-1``, the *first* failed check decides the outcome — a non-PSD
``M = W⁻¹ − θS`` is a terminal "neurotic breakdown" (reference: assert/throw),
while a non-PSD ``H`` triggers ``increase_μ_and_Δ!`` and a full restart.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.ops import smallmat
from ratilqr_tpu.ops.approx import Approximation, _sym

Array = jnp.ndarray

# Bound on μ-restart attempts. The reference's retry loop (ileqg.jl:359) is
# unbounded, but μ grows super-geometrically (μ ← μ·Δ with Δ doubling), so
# any problem the reference could regularize succeeds long before 40 rounds;
# lanes that still fail are declared infeasible (failed=True).
MAX_MU_RESTARTS = 40


class DPResult(NamedTuple):
    """Counterpart of ``DynamicProgrammingResult`` (``ileqg.jl:328-335``).

    ``s``/``s_vec``/``S`` have leading dim ``N+1`` (index 0 = initial time),
    ``g``/``G``/``H`` have leading dim ``N``.
    """
    s: Array       # (N+1,)
    s_vec: Array   # (N+1, n)
    S: Array       # (N+1, n, n)
    g: Array       # (N, m)
    G: Array       # (N, m, n)
    H: Array       # (N, m, m)

    @property
    def value(self) -> Array:
        """Cost-to-go at the initial state (``s_array[1]`` in the ref)."""
        return self.s[0]


def increase_mu_delta(mu: Array, delta: Array, mu_min: float,
                      delta_0: float) -> Tuple[Array, Array]:
    """``increase_μ_and_Δ!`` (``ileqg.jl:471-474``)."""
    delta = jnp.maximum(delta_0, delta * delta_0)
    mu = jnp.maximum(mu_min, mu * delta)
    return mu, delta


def decrease_mu_delta(mu: Array, delta: Array, mu_min: float,
                      delta_0: float) -> Tuple[Array, Array]:
    """``decrease_μ_and_Δ!`` (``ileqg.jl:480-488``).

    Exported for parity (the reference exports and unit-tests it but never
    calls it from the solver loop — SURVEY.md §2 C6 note).
    """
    delta = jnp.minimum(1.0 / delta_0, delta / delta_0)
    new_mu = mu * delta
    mu = jnp.where(new_mu >= mu_min, new_mu, 0.0)
    return mu, delta


def _chol_ok(chol: Array) -> Array:
    """PSD test: Cholesky succeeded iff the factor is finite.

    Counterpart of Julia ``isposdef`` (``ileqg.jl:366,372``); the closed-form
    factorization yields NaN (sqrt of a negative) instead of raising.
    """
    return smallmat.chol_ok(chol)


def _riccati_core(approx: Approximation, theta: Array, mu: Array,
                  L_traj: Optional[Array], dl_traj: Optional[Array],
                  unroll: int = 1
                  ) -> Tuple[DPResult, Array, Array, Array, Array]:
    """One full backward pass, shared by the optimizing and evaluating modes.

    If ``L_traj is None`` the pass *optimizes* the policy (computes gains
    ``L = −H⁻¹G``, offsets ``dl = −H⁻¹g`` and checks H-PSD, per
    ``ileqg.jl:341-406``); otherwise it *evaluates* the fixed policy
    (``ileqg.jl:412-465``) with optional offsets ``dl_traj``.

    Returns ``(dp_result, L_out, dl_out, m_fail, h_fail)`` where the fail
    flags identify the first failed check in backward scan order.
    """
    optimizing = L_traj is None
    n = approx.A.shape[-1]
    m = approx.B.shape[-1]
    dtype = approx.A.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    theta_is_zero = theta == 0.0
    theta_safe = jnp.where(theta_is_zero, jnp.ones((), dtype), theta)

    # Evaluating mode: dl arrives in the scan inputs except on the slim
    # has_dl=False path, where the core synthesizes dl0 = 0 itself (and
    # the Pallas kernel never materializes it) - do NOT assume
    # _core_dispatch always supplies a concrete dl_traj.

    def step(carry, inp):
        s, s_vec, S, m_fail, h_fail = carry
        failed = m_fail | h_fail
        if optimizing:
            q, q_vec, Q, r, R, P, A, B, W, W_inv, logdet_W = inp
        else:
            q, q_vec, Q, r, R, P, A, B, W, W_inv, logdet_W, L, dl = inp

        # M = W⁻¹ − θ S_{t+1}   (ileqg.jl:365); PSD via closed-form
        # Cholesky (ops/smallmat.py) — pure VPU arithmetic, no custom call.
        M = _sym(W_inv - theta * S)
        M_chol = smallmat.cholesky(M)
        m_ok = _chol_ok(M_chol)
        # Latch the *first* failure in backward order (ref throws here).
        m_fail = m_fail | (~failed & ~m_ok)

        # D = I + θ S_{t+1} M⁻¹  (ileqg.jl:367).  S, M symmetric ⇒
        # S M⁻¹ = (M⁻¹ S)ᵀ, one triangular solve instead of an inverse.
        MinvS = smallmat.cho_solve_mat(M_chol, S)
        D = eye_n + theta * MinvS.T
        DS = D @ S

        g = r + B.T @ (D @ s_vec)                      # ileqg.jl:368
        G = P + B.T @ DS @ A                           # ileqg.jl:369
        H = _sym(R + B.T @ DS @ B + mu * eye_m)        # ileqg.jl:370-371

        if optimizing:
            H_chol = smallmat.cholesky(H)
            h_ok = _chol_ok(H_chol)
            h_fail = h_fail | (~failed & ~m_fail & ~h_ok)
            # L = −H⁻¹G, dl = −H⁻¹g  (ileqg.jl:379-382).
            L = -smallmat.cho_solve_mat(H_chol, G)
            dl = -smallmat.cho_solve_vec(H_chol, g)

        Hdl = H @ dl
        s_new = q + s + 0.5 * dl @ Hdl + dl @ g        # ileqg.jl:383
        # Risk term: θ=0 → ½tr(W S') (ileqg.jl:385);
        # θ>0 → θ/2 s⃗ᵀM⁻¹s⃗ − 1/(2θ)·logdet(WM) (ileqg.jl:387).
        Minv_svec = smallmat.cho_solve_vec(M_chol, s_vec)
        logdet_M = smallmat.cho_logdet(M_chol)
        risk_neutral = 0.5 * jnp.trace(W @ S)
        risk_sensitive = (0.5 * theta * (s_vec @ Minv_svec)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        s_new = s_new + jnp.where(theta_is_zero, risk_neutral, risk_sensitive)

        s_vec_new = (q_vec + A.T @ (D @ s_vec) + L.T @ Hdl + L.T @ g
                     + G.T @ dl)                       # ileqg.jl:389
        S_new = _sym(Q + A.T @ DS @ A + L.T @ H @ L + L.T @ G
                     + G.T @ L)                        # ileqg.jl:390-391

        carry_new = (s_new, s_vec_new, S_new, m_fail, h_fail)
        return carry_new, (s_new, s_vec_new, S_new, g, G, H, L, dl)

    init = (approx.q_term, approx.q_vec_term, approx.Q_term,
            jnp.zeros((), bool), jnp.zeros((), bool))
    xs = (approx.q, approx.q_vec, approx.Q, approx.r, approx.R, approx.P,
          approx.A, approx.B, approx.W, approx.W_inv, approx.logdet_W)
    if not optimizing:
        xs = xs + (L_traj, dl_traj)

    # TPU lowers f32 dot_general to reduced-precision MXU passes by
    # default; compounded over the T-step recursion this loses ~4 digits
    # on the gains (measured: scan-vs-f64 gain deviation >100% at T=100
    # where the true-f32 Pallas kernel holds 5e-5 — see
    # benchmarks/pallas_tpu_verification.json).  These matmuls are 3×3 —
    # full-precision passes cost nothing; CPU ignores the setting.
    with jax.default_matmul_precision("highest"):
        (_, _, _, m_fail, h_fail), ys = lax.scan(step, init, xs,
                                                 reverse=True, unroll=unroll)
    s_s, s_vec_s, S_s, g_s, G_s, H_s, L_out, dl_out = ys

    dp = DPResult(
        s=jnp.concatenate([s_s, approx.q_term[None]]),
        s_vec=jnp.concatenate([s_vec_s, approx.q_vec_term[None]]),
        S=jnp.concatenate([S_s, approx.Q_term[None]]),
        g=g_s, G=G_s, H=H_s)
    return dp, L_out, dl_out, m_fail, h_fail


# --- Pallas bank dispatch -------------------------------------------------
#
# When a whole bank of Riccati passes runs under `vmap` on TPU, the fused
# Pallas kernel (ops/riccati_pallas.py) replaces the vmapped scan: ~160x
# faster on-device (152us vs 24.9ms for a B=2048 T=100 pass — ~60% of the
# HBM roofline) and tighter f32 accuracy (p50 rel-dev vs an f64 oracle:
# ~5e-5 on gains where the scan path loses digits through the recursion;
# measured artifact: benchmarks/pallas_tpu_verification.json).
# `jax.custom_batching.custom_vmap` keeps the per-example semantics
# identical — unbatched calls and non-TPU backends take the scan path.
#
# The solver hot path uses `slim=True` cores: the kernel writes only what
# the solver reads (value/L/dl/fails), and the lane-invariant noise model
# (W/W_inv/logdet_W — constants of the problem, unbatched under the lane
# vmap) is NOT broadcast to the bank: the batching rules forward it
# unbatched and the kernel streams it via SMEM once per step instead of
# once per lane per step.  The workload is HBM-bound (docs/performance.md),
# so these cuts are a direct kernel-time reduction.

import os as _os


def _pallas_eligible(axis_size: int, dtype) -> bool:
    if _os.environ.get("RATILQR_DISABLE_PALLAS") == "1":
        return False
    if _os.environ.get("RATILQR_FORCE_PALLAS") == "1":
        # Forced (interpret-mode testing) still requires f32 - the Mosaic
        # kernel has no f64 lowering; fall back to the scan path loudly
        # eligible-checked rather than crash inside the kernel.
        return dtype == jnp.float32
    # Default threshold 1: ANY vmapped f32 bank on TPU takes the kernel.
    # The kernel pads lanes to one (8, 128) tile, so a 6-lane bank costs
    # the same as a 1024-lane one — and even fully padded it beats the
    # vmapped-scan fallback by ~2 orders of magnitude (measured round 3:
    # the 6-lane Nelder-Mead candidate bank re-plan fell 363 ms → 160 ms
    # p50, a single warm 6-lane bank solve 99 ms → 33 ms; the old 256
    # threshold was tuned on throughput banks where it never binds).
    return (jax.default_backend() in ("tpu", "axon")
            and dtype == jnp.float32
            and axis_size >= int(_os.environ.get(
                "RATILQR_PALLAS_MIN_LANES", "1")))


_W_FIELDS = ("W", "W_inv", "logdet_W")


def _bc_args(axis_size, in_batched, args, keep_w_shared: bool):
    """Broadcast unbatched args to the lane axis.

    With ``keep_w_shared``, the approximation's noise-model fields are left
    unbatched when they were not vmapped over (the common case: W depends
    only on the problem) — the Pallas path streams them via SMEM.
    """
    def bc(x, b):
        if b:
            return x
        x = jnp.asarray(x)
        return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    args_b = jax.tree_util.tree_map(bc, args, tuple(in_batched))
    if keep_w_shared:
        approx, approx_b = args[0], args_b[0]
        batched = in_batched[0]
        args_b = (approx_b._replace(**{
            f: (getattr(approx_b, f) if getattr(batched, f)
                else jnp.asarray(getattr(approx, f)))
            for f in _W_FIELDS
        }),) + args_b[1:]
    return args_b


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=64)
def _make_core(optimizing: bool, unroll: int, slim: bool = False,
               has_dl: bool = True):
    """Build the custom_vmap-wrapped Riccati core for one mode/unroll.

    Nested ``vmap`` levels (e.g. the line-search candidate chunk inside the
    θ-bank) are *flattened* into one lane axis via a second custom_vmap
    (``banked``): the innermost vmap fires the core rule, which delegates to
    ``banked``; every further vmap level fires ``banked``'s own rule, which
    reshapes ``(outer, lanes, ...) → (outer·lanes, ...)`` and recurses.  The
    Pallas kernel therefore sees the FULL flattened lane count (B·c) instead
    of only the innermost chunk — without this, a candidate chunk of 8 would
    fall below the lane threshold and silently lose the kernel.

    ``slim`` selects the reduced-output variant (see module comment);
    ``has_dl`` (evaluating mode only) selects whether a ``dl`` stream
    exists (``False`` evaluates the pure-feedback policy without streaming
    zeros).  The scan path implements slim by slicing the full core — jit
    DCE then prunes the unused recursion outputs.
    """
    if optimizing:
        if slim:
            def core(approx, theta, mu):
                dp, L, dl, m_fail, h_fail = _riccati_core(
                    approx, theta, mu, None, None, unroll)
                return dp.s[0], L, dl, m_fail, h_fail
        else:
            def core(approx, theta, mu):
                return _riccati_core(approx, theta, mu, None, None, unroll)
    elif slim:
        if has_dl:
            def core(approx, theta, mu, L_traj, dl_traj):
                dp, _, _, m_fail, _ = _riccati_core(
                    approx, theta, mu, L_traj, dl_traj, unroll)
                return dp.s[0], m_fail
        else:
            def core(approx, theta, mu, L_traj):
                dl0 = jnp.zeros((approx.N, approx.B.shape[-1]),
                                approx.A.dtype)
                dp, _, _, m_fail, _ = _riccati_core(
                    approx, theta, mu, L_traj, dl0, unroll)
                return dp.s[0], m_fail
    else:
        def core(approx, theta, mu, L_traj, dl_traj):
            return _riccati_core(approx, theta, mu, L_traj, dl_traj, unroll)

    def banked(*args):
        """Run a bank with a single leading lane axis on every arg."""
        approx_b, theta_b = args[0], args[1]
        axis_size = theta_b.shape[0]
        dtype = approx_b.A.dtype
        if _pallas_eligible(axis_size, dtype):
            from ratilqr_tpu.ops.riccati_pallas import riccati_bank
            if optimizing:
                bank = riccati_bank(approx_b, theta_b, args[2], slim=slim)
            elif has_dl or not slim:
                bank = riccati_bank(approx_b, theta_b, args[2], args[3],
                                    args[4], slim=slim)
            else:
                bank = riccati_bank(approx_b, theta_b, args[2], args[3],
                                    slim=slim)
            if slim:
                if optimizing:
                    return (bank.value, bank.L, bank.dl, bank.m_fail,
                            bank.h_fail)
                return (bank.value, bank.m_fail)
            dp = DPResult(
                s=jnp.concatenate(
                    [bank.s, approx_b.q_term[:, None]], axis=1),
                s_vec=jnp.concatenate(
                    [bank.s_vec, approx_b.q_vec_term[:, None]], axis=1),
                S=jnp.concatenate(
                    [bank.S, approx_b.Q_term[:, None]], axis=1),
                g=bank.g, G=bank.G, H=bank.H)
            return (dp, bank.L, bank.dl, bank.m_fail, bank.h_fail)
        # Scan fallback: re-broadcast any noise-model fields a batching
        # rule left unbatched (vmap needs every input batched).
        if approx_b.W.ndim == 3:
            approx_b = approx_b._replace(**{
                f: jnp.broadcast_to(
                    getattr(approx_b, f)[None],
                    (axis_size,) + getattr(approx_b, f).shape)
                for f in _W_FIELDS})
            args = (approx_b,) + args[1:]
        return jax.vmap(core)(*args)

    banked_cv = jax.custom_batching.custom_vmap(banked)

    @banked_cv.def_vmap
    def _flatten_rule(axis_size, in_batched, *args):
        # Whether the flattened bank takes the Pallas path is decided by
        # `banked` itself; keeping the W-fields unbatched here is safe
        # either way because `banked` re-broadcasts for the scan fallback.
        inner = args[1].shape[-1]  # theta: (axis, inner) or (inner,)
        approx = args[0]
        base_ndim = {"W": 3, "W_inv": 3, "logdet_W": 1}

        def norm_w(f):
            """Normalize a noise-model field to shared (base rank) when it
            is lane-invariant at BOTH vmap levels, else to fully batched
            ``(axis·inner, ...)``."""
            x = jnp.asarray(getattr(approx, f))
            b = getattr(in_batched[0], f)
            base = base_ndim[f]
            if not b and x.ndim == base:          # shared at both levels
                return x
            if not b:                             # per-lane, outer-invariant
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            elif x.ndim == base + 1:              # shared-inner, outer-batched
                x = jnp.broadcast_to(x[:, None],
                                     (axis_size, inner) + x.shape[1:])
            return x.reshape((axis_size * inner,) + x.shape[2:])

        w_norm = {f: norm_w(f) for f in _W_FIELDS}
        # Everything else: broadcast to (axis, inner, ...) then flatten.
        placeholder = approx._replace(
            **{f: jnp.zeros((axis_size, inner), approx.q.dtype)
               for f in _W_FIELDS})
        ib0 = in_batched[0]._replace(**{f: True for f in _W_FIELDS})
        args_b = _bc_args(axis_size, (ib0,) + tuple(in_batched[1:]),
                          (placeholder,) + args[1:], keep_w_shared=False)
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((axis_size * inner,) + x.shape[2:]), args_b)
        flat = (flat[0]._replace(**w_norm),) + flat[1:]
        out = banked_cv(*flat)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((axis_size, inner) + x.shape[1:]), out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    cv = jax.custom_batching.custom_vmap(core)

    @cv.def_vmap
    def _rule(axis_size, in_batched, *args):
        args_b = _bc_args(axis_size, in_batched, args, keep_w_shared=True)
        out = banked_cv(*args_b)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return cv


def _core_dispatch(approx, theta, mu, L_traj, dl_traj, unroll,
                   slim: bool = False):
    if L_traj is None:
        return _make_core(True, unroll, slim)(approx, theta, mu)
    if dl_traj is None:
        if slim:
            return _make_core(False, unroll, True, has_dl=False)(
                approx, theta, mu, L_traj)
        dl_traj = jnp.zeros((approx.N, approx.B.shape[-1]), approx.A.dtype)
    return _make_core(False, unroll, slim)(approx, theta, mu, L_traj,
                                           dl_traj)


def dp_evaluate(approx: Approximation, L_traj: Array,
                dl_traj: Optional[Array] = None, *, theta: Array,
                mu: Array, unroll: int = 1,
                slim: bool = False) -> Tuple[Union[DPResult, Array], Array]:
    """Policy-evaluating backward pass under fixed gains.

    Counterpart of ``solve_approximate_dp`` (``ileqg.jl:412-465``).  Returns
    ``(dp_result, failed)`` where ``failed`` replaces the reference's M-PSD
    assert/throw ("neurotic breakdown", ``ileqg.jl:440``).

    With ``slim=True`` the first element is the scalar cost-to-go
    ``dp_result.value`` instead of the full :class:`DPResult` — the solver
    hot path's variant (only the initial-time value is consumed; the Pallas
    kernel then skips writing the per-step stacks entirely).
    """
    theta = jnp.asarray(theta, approx.A.dtype)
    mu = jnp.asarray(mu, approx.A.dtype)
    if slim:
        value, m_fail = _core_dispatch(approx, theta, mu, L_traj, dl_traj,
                                       unroll, slim=True)
        return value, m_fail
    dp, _, _, m_fail, _ = _core_dispatch(approx, theta, mu, L_traj,
                                         dl_traj, unroll)
    return dp, m_fail


def _riccati_folded_core(fa, theta: Array,
                         unroll: int = 1) -> Tuple[Array, Array]:
    """Policy-evaluating backward pass over a closed-loop-FOLDED stack.

    Algebraically identical to the ``dl = 0`` evaluating pass
    (``ileqg.jl:412-465``; see :class:`~ratilqr_tpu.ops.approx.
    FoldedApprox` for the substitution): with ``Ā = A + BL`` etc. the
    recursion needs neither the control-side blocks nor ``L``/μ —

        M  = W⁻¹ − θS            (PSD check: neurotic breakdown)
        D  = I + θ S M⁻¹
        s  ← q + s + risk(s⃗, S, M, W)
        s⃗  ← q̄_vec + ĀᵀD s⃗
        S  ← sym(Q̄ + ĀᵀD S Ā)

    Returns ``(value, m_fail)`` (slim by construction: this path exists
    for value-only candidate evaluations).
    """
    n = fa.A.shape[-1]
    dtype = fa.A.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    theta_is_zero = theta == 0.0
    theta_safe = jnp.where(theta_is_zero, jnp.ones((), dtype), theta)

    def step(carry, inp):
        s, s_vec, S, m_fail = carry
        q, q_vec, Q, A, W, W_inv, logdet_W = inp

        M = _sym(W_inv - theta * S)
        M_chol = smallmat.cholesky(M)
        m_fail = m_fail | ~_chol_ok(M_chol)

        MinvS = smallmat.cho_solve_mat(M_chol, S)
        D = eye_n + theta * MinvS.T
        DS = D @ S

        s_new = q + s
        Minv_svec = smallmat.cho_solve_vec(M_chol, s_vec)
        logdet_M = smallmat.cho_logdet(M_chol)
        risk_neutral = 0.5 * jnp.trace(W @ S)
        risk_sensitive = (0.5 * theta * (s_vec @ Minv_svec)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        s_new = s_new + jnp.where(theta_is_zero, risk_neutral,
                                  risk_sensitive)

        s_vec_new = q_vec + A.T @ (D @ s_vec)
        S_new = _sym(Q + A.T @ DS @ A)
        return (s_new, s_vec_new, S_new, m_fail), None

    init = (fa.q_term, fa.q_vec_term, fa.Q_term, jnp.zeros((), bool))
    xs = (fa.q, fa.q_vec, fa.Q, fa.A, fa.W, fa.W_inv, fa.logdet_W)
    with jax.default_matmul_precision("highest"):
        (s, _, _, m_fail), _ = lax.scan(step, init, xs, reverse=True,
                                        unroll=unroll)
    return s, m_fail


@_lru_cache(maxsize=32)
def _make_folded_core(unroll: int):
    """custom_vmap wrapper for the folded evaluating pass — same two-level
    structure as :func:`_make_core` (vmapped banks route to the Pallas
    kernel; nested vmap levels flatten into one lane axis) specialized to
    the value-only folded mode."""

    def core(fa, theta):
        return _riccati_folded_core(fa, theta, unroll)

    def banked(fa_b, theta_b):
        axis_size = theta_b.shape[0]
        if _pallas_eligible(axis_size, fa_b.A.dtype):
            from ratilqr_tpu.ops.riccati_pallas import riccati_bank_folded
            bank = riccati_bank_folded(fa_b, theta_b)
            return bank.value, bank.m_fail
        if fa_b.W.ndim == 3:
            fa_b = fa_b._replace(**{
                f: jnp.broadcast_to(
                    getattr(fa_b, f)[None],
                    (axis_size,) + getattr(fa_b, f).shape)
                for f in _W_FIELDS})
        return jax.vmap(core)(fa_b, theta_b)

    banked_cv = jax.custom_batching.custom_vmap(banked)

    @banked_cv.def_vmap
    def _flatten_rule(axis_size, in_batched, fa, theta):
        inner = theta.shape[-1]
        base_ndim = {"W": 3, "W_inv": 3, "logdet_W": 1}

        def norm_w(f):
            x = jnp.asarray(getattr(fa, f))
            b = getattr(in_batched[0], f)
            base = base_ndim[f]
            if not b and x.ndim == base:
                return x
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            elif x.ndim == base + 1:
                x = jnp.broadcast_to(x[:, None],
                                     (axis_size, inner) + x.shape[1:])
            return x.reshape((axis_size * inner,) + x.shape[2:])

        w_norm = {f: norm_w(f) for f in _W_FIELDS}
        placeholder = fa._replace(
            **{f: jnp.zeros((axis_size, inner), fa.q.dtype)
               for f in _W_FIELDS})
        ib0 = in_batched[0]._replace(**{f: True for f in _W_FIELDS})
        args_b = _bc_args(axis_size, (ib0, in_batched[1]),
                          (placeholder, theta), keep_w_shared=False)
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((axis_size * inner,) + x.shape[2:]), args_b)
        flat = (flat[0]._replace(**w_norm),) + flat[1:]
        out = banked_cv(*flat)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((axis_size, inner) + x.shape[1:]), out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    cv = jax.custom_batching.custom_vmap(core)

    @cv.def_vmap
    def _rule(axis_size, in_batched, fa, theta):
        args_b = _bc_args(axis_size, in_batched, (fa, theta),
                          keep_w_shared=True)
        return banked_cv(*args_b), (True, True)

    return cv


def dp_evaluate_folded(folded, *, theta: Array,
                       unroll: int = 1) -> Tuple[Array, Array]:
    """Value-only policy evaluation over a closed-loop-folded stack.

    The line-search-candidate / ``initialize!`` fast path: semantically
    equal to ``dp_evaluate(approx, L, None, theta=θ, mu=μ, slim=True)``
    on the unfolded stack (``ileqg.jl:412-465`` with ``dl = 0``), but
    streams 22 instead of 46 floats/step/lane.  Returns
    ``(value, m_fail)``.
    """
    theta = jnp.asarray(theta, folded.A.dtype)
    return _make_folded_core(unroll)(folded, theta)


def mu_restart_loop(run, mu: Array, delta: Array, mu_min: float,
                    delta_0: float, max_restarts: int):
    """Shared μ-restart retry harness (``ileqg.jl:358-401``): re-run the
    full backward pass with escalated μ while some H_t is not PSD.

    ``run(mu) -> (*payload, m_fail, h_fail)`` for any non-empty payload
    (the sequential backend passes ``(dp, L, dl)`` or slim ``(value, L,
    dl)``; the parallel backend ``(dp, L, dl)``).  Returns
    ``(*payload, mu, delta, failed)``.  Used by every backend so restart
    semantics cannot drift.
    """
    out0 = run(mu)
    payload0, m_fail0, h_fail0 = out0[:-2], out0[-2], out0[-1]
    state = (payload0, mu, delta, m_fail0, h_fail0,
             jnp.zeros((), jnp.int32))

    def cond(state):
        _, _, _, m_fail, h_fail, k = state
        return h_fail & ~m_fail & (k < max_restarts)

    def body(state):
        _, mu_v, delta_v, _, _, k = state
        mu_v, delta_v = increase_mu_delta(mu_v, delta_v, mu_min, delta_0)
        out = run(mu_v)
        return (out[:-2], mu_v, delta_v, out[-2], out[-1], k + 1)

    payload, mu, delta, m_fail, h_fail, _ = lax.while_loop(
        cond, body, state)
    return (*payload, mu, delta, m_fail | h_fail)


def dp_optimize(approx: Approximation, *, theta: Array, mu: Array,
                delta: Array, mu_min: float, delta_0: float,
                max_restarts: int = MAX_MU_RESTARTS, unroll: int = 1,
                slim: bool = False
                ) -> Tuple[Union[DPResult, Array], Array, Array, Array,
                           Array, Array]:
    """Policy-optimizing backward pass with the μ-restart retry loop.

    Counterpart of ``solve_approximate_dp!`` (``ileqg.jl:341-406``): the
    outer ``while !all_hessians_psd`` loop that bumps μ/Δ and restarts from
    ``t = N`` on any non-PSD ``H_t`` becomes a bounded ``lax.while_loop``.

    Returns ``(dp_result, L, dl, mu, delta, failed)``; ``failed`` is True on
    neurotic breakdown (non-PSD M — the reference throws) or restart-budget
    exhaustion.  With ``slim=True`` the first element is the scalar value
    instead of the full :class:`DPResult` (same tuple arity; the solver hot
    path's variant — the Pallas kernel skips the unused per-step stacks).
    """
    dtype = approx.A.dtype
    theta = jnp.asarray(theta, dtype)
    mu = jnp.asarray(mu, dtype)
    delta = jnp.asarray(delta, dtype)

    def run(mu_v):
        return _core_dispatch(approx, theta, mu_v, None, None, unroll,
                              slim=slim)

    return mu_restart_loop(run, mu, delta, mu_min, delta_0, max_restarts)
