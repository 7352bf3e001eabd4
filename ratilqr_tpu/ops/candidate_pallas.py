"""Pallas TPU kernel: FUSED line-search candidate evaluation.

The line-search trial is the largest non-DP slice of warm-solve device
time (2 × 16.5 ms at B=65,536 — docs/performance.md "Warm re-plan device
budget"): the XLA composition materializes the (x, u, A, B) rollout
stacks (~524 MB) and the quadratization stack (~1 GB) in HBM only to
reduce them to ONE scalar value per lane.  This kernel runs the whole
trial — closed-loop rollout, quadratization, closed-loop fold, and the
folded evaluating Riccati backward pass — as a single Mosaic program:

  - **Grid** ``(lane_tiles, 2T)``: steps ``0..T-1`` are the FORWARD phase
    (roll out ``u = l_cand + L(x − x̄)``, compute the model derivatives
    from the problem's :class:`~ratilqr_tpu.ops.tile_model.TileModel`,
    fold to the 22-float ``(q, q̄_vec, Q̄, Ā)`` stack — stored in VMEM
    scratch, never touching HBM); steps ``T..2T-1`` are the BACKWARD
    phase (the folded DP recursion of ``riccati_pallas.
    _riccati_folded_kernel``, reading the stack back out of VMEM).
  - **HBM traffic**: ``x̄ (n) + l_cand (m) + L (m·n)`` floats/step/lane in
    and ~nothing out — ~11 floats for the unicycle vs ~46 for the DP
    kernel alone and >120 for the full XLA composition (stacks written
    then re-read).  The trial becomes compute-bound.
  - **VMEM budget**: the folded stack costs ``(1 + n + 2n²)·T`` floats
    per lane = ``(1 + n + 2n²)·T·4096`` bytes per 1024-lane tile
    (unicycle T=100: 9.0 MB).  :func:`fits_vmem` gates dispatch; larger
    models/horizons keep the XLA path.
  - **Semantics**: identical to ``approximate_folded`` +
    ``dp_evaluate_folded`` (same formulas; the tile model must equal the
    AD derivatives — pinned by ``tests/test_candidate_fused.py``), which
    are themselves pinned to the unfolded evaluating DP
    (``ileqg.jl:412-465`` with dl = 0).

Reference hot loop being replaced: the per-trial re-rollout +
re-approximation at ``/root/reference/src/ileqg.jl:510-528``.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ratilqr_tpu.ops.riccati_pallas import (LANE_TILE, LANES, _chol,
                                            _chol_ok_mask, _cho_logdet,
                                            _cho_solve_mat, _cho_solve_vec,
                                            _dot, _from_lanes, _mat, _mmul,
                                            _mvec, _rinv_diag, _sym, _t,
                                            _to_lanes, _use_interpret)

Array = jnp.ndarray


def fits_vmem(n: int, T: int) -> bool:
    """Whether the folded VMEM stack for (n, T) fits the budget."""
    budget = int(os.environ.get("RATILQR_CANDIDATE_VMEM_BYTES",
                                str(10 * 1024 * 1024)))
    return (1 + n + 2 * n * n) * T * LANES * 4 <= budget


def fits_vmem_recompute(n: int, m: int, T: int) -> bool:
    """Whether the RECOMPUTE variant fits: only the candidate trajectory
    ``(T+1)·n`` is stored; the backward phase re-derives the folded
    blocks from ``(x_t, x̄_t, l_t, L_t)`` per step (same trick as
    ``step_pallas`` — extends the kernel to models/horizons whose folded
    stack busts VMEM, e.g. the n=12 quadrotor or unicycle T≫100).
    Slack term covers the windowed input/carry blocks."""
    budget = int(os.environ.get("RATILQR_CANDIDATE_VMEM_BYTES",
                                str(10 * 1024 * 1024)))
    per_lane = (T + 1) * n + 4 * (m * n + m + n * n + n)
    return per_lane * LANES * 4 <= budget


class CandidateOut(NamedTuple):
    value: Array   # (B,)  candidate cost-to-go at the initial time
    m_fail: Array  # (B,)  neurotic-breakdown flag (non-PSD M)


def _candidate_kernel(tm, T, n, m, *refs):
    (xref_ref, lcand_ref, Lg_ref, W_ref, Wi_ref, ldW_ref, theta_ref,
     mu_ref, val_ref, mfail_ref, x_sc, qs_sc, qvs_sc, Qs_sc, As_sc,
     S_sc, svec_sc, s_sc, mfail_sc) = refs

    ti = pl.program_id(1)
    theta = theta_ref[...]
    mu = mu_ref[...]

    @pl.when(ti == 0)
    def _init():
        # The closed-loop candidate starts at the nominal start state
        # (rollout_feedback: x_0 = x̄_0 — this step's x̄ window).
        x_sc[...] = xref_ref[...]
        mfail_sc[...] = jnp.zeros_like(mfail_sc)

    @pl.when(ti < T)
    def _forward():
        x = x_sc[...]
        xbar = xref_ref[...]
        lc = lcand_ref[...]
        Lg = Lg_ref[...]
        u = lc + _mvec(Lg, x - xbar)
        x_next, A, B = tm.f_jac_tile(x, u)
        q, q_vec, Q, r, R, P = tm.quad_tile(ti, x, u)

        # Closed-loop fold (FoldedApprox identities, approx.py):
        #   q̄_vec = q_vec + Lᵀr
        #   Q̄     = sym(Q + LᵀP + PᵀL + LᵀRL + μLᵀL)
        #   Ā     = A + BL
        Lt = _t(Lg)
        qv_f = q_vec + _mvec(Lt, r)
        LtP = _mmul(Lt, P)
        Q_f = _sym(Q + LtP + _t(LtP) + _mmul(Lt, _mmul(R, Lg))
                   + mu[None, None] * _mmul(Lt, Lg))
        A_f = A + _mmul(B, Lg)

        qs_sc[ti] = q
        qvs_sc[ti] = qv_f
        Qs_sc[ti] = Q_f
        As_sc[ti] = A_f
        x_sc[...] = x_next

        @pl.when(ti == T - 1)
        def _terminal():
            qT, qvT, QT = tm.term_tile(x_next)
            s_sc[...] = qT
            svec_sc[...] = qvT
            S_sc[...] = QT

    @pl.when(ti >= T)
    def _backward():
        # Folded evaluating DP step (same algebra as riccati_pallas.
        # _riccati_folded_kernel, w_shared branch) over the VMEM stack.
        t = 2 * T - 1 - ti
        q = qs_sc[t]
        q_vec = qvs_sc[t]
        Q = Qs_sc[t]
        A = As_sc[t]

        theta_is_zero = theta == 0.0
        theta_safe = jnp.where(theta_is_zero, jnp.ones_like(theta), theta)
        S = S_sc[...]
        s_vec = svec_sc[...]
        s = s_sc[...]
        m_fail = mfail_sc[...]

        M = _sym(_mat([[Wi_ref[i, j] - theta * S[i, j] for j in range(n)]
                       for i in range(n)]))
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
        risk_neutral = 0.5 * sum(W_ref[i, j] * S[j, i]
                                 for i in range(n) for j in range(n))
        logdet_W = ldW_ref[0, 0]
        risk_sensitive = (0.5 * theta * _dot(s_vec, Minv_svec)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        s_new = s_new + jnp.where(theta_is_zero, risk_neutral,
                                  risk_sensitive)

        At = _t(A)
        s_vec_new = q_vec + _mvec(At, _mvec(D, s_vec))
        S_new = _sym(Q + _mmul(_mmul(At, DS), A))

        val_ref[...] = s_new
        mfail_ref[...] = m_fail
        S_sc[...] = S_new
        svec_sc[...] = s_vec_new
        s_sc[...] = s_new
        mfail_sc[...] = m_fail


def _candidate_kernel_recompute(tm, T, n, m, *refs):
    """RECOMPUTE variant: only the candidate trajectory is stored in VMEM;
    the backward phase re-derives (u, A, B, quad, fold) from
    ``(x_t, x̄_t, l_t, L_t)`` per step.  Same algebra as
    :func:`_candidate_kernel` — the folded blocks are recomputed
    bit-identically (same formulas, same inputs) instead of read back."""
    (xref_ref, lcand_ref, Lg_ref, W_ref, Wi_ref, ldW_ref, theta_ref,
     mu_ref, val_ref, mfail_ref, x_sc, S_sc, svec_sc, s_sc,
     mfail_sc) = refs

    ti = pl.program_id(1)
    theta = theta_ref[...]
    mu = mu_ref[...]

    @pl.when(ti == 0)
    def _init():
        x_sc[0] = xref_ref[...]
        mfail_sc[...] = jnp.zeros_like(mfail_sc)

    def folded_blocks(t):
        """(u, fold) at time t from the stored x and re-walked inputs."""
        x = x_sc[t]
        xbar = xref_ref[...]
        lc = lcand_ref[...]
        Lg = Lg_ref[...]
        u = lc + _mvec(Lg, x - xbar)
        x_next, A, B = tm.f_jac_tile(x, u)
        q, q_vec, Q, r, R, P = tm.quad_tile(t, x, u)
        Lt = _t(Lg)
        qv_f = q_vec + _mvec(Lt, r)
        LtP = _mmul(Lt, P)
        Q_f = _sym(Q + LtP + _t(LtP) + _mmul(Lt, _mmul(R, Lg))
                   + mu[None, None] * _mmul(Lt, Lg))
        A_f = A + _mmul(B, Lg)
        return x_next, q, qv_f, Q_f, A_f

    @pl.when(ti < T)
    def _forward():
        x_next, _, _, _, _ = folded_blocks(ti)
        x_sc[ti + 1] = x_next

        @pl.when(ti == T - 1)
        def _terminal():
            qT, qvT, QT = tm.term_tile(x_next)
            s_sc[...] = qT
            svec_sc[...] = qvT
            S_sc[...] = QT

    @pl.when(ti >= T)
    def _backward():
        t = 2 * T - 1 - ti
        _, q, q_vec, Q, A = folded_blocks(t)

        theta_is_zero = theta == 0.0
        theta_safe = jnp.where(theta_is_zero, jnp.ones_like(theta), theta)
        S = S_sc[...]
        s_vec = svec_sc[...]
        s = s_sc[...]
        m_fail = mfail_sc[...]

        M = _sym(_mat([[Wi_ref[i, j] - theta * S[i, j] for j in range(n)]
                       for i in range(n)]))
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
        risk_neutral = 0.5 * sum(W_ref[i, j] * S[j, i]
                                 for i in range(n) for j in range(n))
        logdet_W = ldW_ref[0, 0]
        risk_sensitive = (0.5 * theta * _dot(s_vec, Minv_svec)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        s_new = s_new + jnp.where(theta_is_zero, risk_neutral,
                                  risk_sensitive)

        At = _t(A)
        s_vec_new = q_vec + _mvec(At, _mvec(D, s_vec))
        S_new = _sym(Q + _mmul(_mmul(At, DS), A))

        val_ref[...] = s_new
        mfail_ref[...] = m_fail
        S_sc[...] = S_new
        svec_sc[...] = s_vec_new
        s_sc[...] = s_new
        mfail_sc[...] = m_fail


def candidate_bank(tile_model, x_ref_b: Array, l_cand_b: Array,
                   L_b: Array, mu_b: Array, theta_b: Array,
                   W: Array, W_inv: Array, logdet_W: Array, *,
                   recompute: bool = False) -> CandidateOut:
    """Run the fused candidate evaluation for a whole bank.

    Args:
      tile_model: the problem's :class:`TileModel` (static).
      x_ref_b: ``(B, T+1, n)`` nominal trajectories.
      l_cand_b: ``(B, T, m)`` candidate control schedules (``l + ε·dl``).
      L_b: ``(B, T, m, n)`` frozen feedback gains.
      mu_b, theta_b: ``(B,)`` per-lane regularization / risk sensitivity.
      W, W_inv, logdet_W: lane-invariant noise model ``(T, n, n)``/
        ``(T,)`` — streamed through SMEM (always shared: W depends only
        on the problem).
    """
    B, T = l_cand_b.shape[0], l_cand_b.shape[1]
    n = x_ref_b.shape[-1]
    m = l_cand_b.shape[-1]
    dtype = x_ref_b.dtype
    B_pad = max(LANES, ((B + LANES - 1) // LANES) * LANES)
    tiles = B_pad // LANES
    S8, L8 = LANE_TILE

    def prep(x):
        return _to_lanes(jnp.asarray(x, dtype), B_pad)

    T2 = 2 * T

    def fwd_spec(*dims, horizon=None):
        """Windowed per-lane input, walked forward then parked at its
        last slice during the backward phase (no re-fetch: the block
        index stops changing)."""
        del horizon
        blk = (None,) + dims + (None, S8, L8)

        def imap(bi, ti):
            return (jnp.minimum(ti, T - 1),) + (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def both_spec(*dims):
        """Windowed per-lane input walked forward then BACKWARD (the
        recompute variant re-fetches the model inputs on the way back)."""
        blk = (None,) + dims + (None, S8, L8)

        def imap(bi, ti):
            t = jnp.where(ti < T, ti, T2 - 1 - ti)
            return (t,) + (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def lane_spec(*dims):
        blk = dims + (None, S8, L8)

        def imap(bi, ti):
            return (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def w_spec(*dims):
        """SMEM noise-model slice, walked backward during the DP phase
        (parked at T-1 during the forward phase)."""
        blk = (None,) + dims

        def imap(bi, ti):
            return ((jnp.clip(T2 - 1 - ti, 0, T - 1),)
                    + (0,) * len(dims))
        return pl.BlockSpec(blk, imap, memory_space=pltpu.SMEM)

    traj_spec = both_spec if recompute else fwd_spec
    inputs = [prep(x_ref_b), prep(l_cand_b), prep(L_b),
              jnp.asarray(W, dtype), jnp.asarray(W_inv, dtype),
              jnp.asarray(logdet_W, dtype).reshape(T, 1, 1),
              _to_lanes(theta_b.astype(dtype)[:, None], B_pad)[0],
              _to_lanes(mu_b.astype(dtype)[:, None], B_pad)[0]]
    in_specs = [traj_spec(n), traj_spec(m), traj_spec(m, n),
                w_spec(n, n), w_spec(n, n), w_spec(1, 1),
                lane_spec(), lane_spec()]

    out_shapes = (
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),   # value
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),   # m_fail
    )
    out_specs = (lane_spec(), lane_spec())

    if recompute:
        scratch = [
            pltpu.VMEM((T + 1, n, S8, L8), dtype),   # candidate trajectory
            pltpu.VMEM((n, n, S8, L8), dtype),       # S carry
            pltpu.VMEM((n, S8, L8), dtype),          # s_vec carry
            pltpu.VMEM((S8, L8), dtype),             # s carry
            pltpu.VMEM((S8, L8), dtype),             # m_fail mask
        ]
        kern = functools.partial(_candidate_kernel_recompute, tile_model,
                                 T, n, m)
    else:
        scratch = [
            pltpu.VMEM((n, S8, L8), dtype),          # x rollout carry
            pltpu.VMEM((T, S8, L8), dtype),          # folded q stack
            pltpu.VMEM((T, n, S8, L8), dtype),       # folded q̄_vec stack
            pltpu.VMEM((T, n, n, S8, L8), dtype),    # folded Q̄ stack
            pltpu.VMEM((T, n, n, S8, L8), dtype),    # folded Ā stack
            pltpu.VMEM((n, n, S8, L8), dtype),       # S carry
            pltpu.VMEM((n, S8, L8), dtype),          # s_vec carry
            pltpu.VMEM((S8, L8), dtype),             # s carry
            pltpu.VMEM((S8, L8), dtype),             # m_fail mask
        ]
        kern = functools.partial(_candidate_kernel, tile_model, T, n, m)

    call = pl.pallas_call(
        kern,
        grid=(tiles, T2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )
    with jax.enable_x64(False):
        val, mfail = call(*inputs)

    scalar = lambda x: _from_lanes(x[None], B)[:, 0]
    return CandidateOut(value=scalar(val), m_fail=scalar(mfail) > 0)


# --- dispatch: unbatched semantics + bank/fleet batching rules -----------

from functools import lru_cache  # noqa: E402

from ratilqr_tpu.ops.riccati import _pallas_eligible  # noqa: E402


@lru_cache(maxsize=128)
def _make_candidate_core(problem, unroll: int):
    """custom_vmap-wrapped candidate evaluation for one problem.

    Per-example semantics = the XLA folded path (``approximate_folded`` +
    ``dp_evaluate_folded`` — algebraically identical to the unfolded
    evaluating DP, pinned by tests/test_pallas.py); a vmapped bank on TPU
    takes the fused kernel.  Nested vmap levels (episode fleets over
    θ-banks) flatten into one lane axis exactly as in
    ``ops.riccati._make_core``.
    """
    from ratilqr_tpu.ops import smallmat
    from ratilqr_tpu.ops.approx import approximate_folded
    from ratilqr_tpu.ops.riccati import dp_evaluate_folded

    tm = problem.tile_model

    def core(x_ref, l_cand, Lg, mu, theta):
        folded = approximate_folded(problem, x_ref, l_cand, Lg, mu,
                                    unroll=unroll)
        value, fail = dp_evaluate_folded(folded, theta=theta,
                                         unroll=unroll)
        return value, fail

    def banked(x_ref, l_cand, Lg, mu, theta):
        axis_size = theta.shape[0]
        T = l_cand.shape[1]
        n = x_ref.shape[-1]
        m = l_cand.shape[-1]
        dtype = x_ref.dtype
        stored_ok = fits_vmem(n, T)
        rec_ok = fits_vmem_recompute(n, m, T)
        if (tm is not None and (stored_ok or rec_ok)
                and _pallas_eligible(axis_size, dtype)):
            # Stored folded stack when it fits (measured fastest at the
            # unicycle fixture); the recompute variant extends coverage to
            # models/horizons whose stack busts VMEM (n=12, T≫100).
            # RATILQR_CANDIDATE_RECOMPUTE=1 forces recompute (A/B, tests).
            rec = ((not stored_ok) or os.environ.get(
                "RATILQR_CANDIDATE_RECOMPUTE") == "1")
            ks = jnp.arange(T)
            Wm = jax.vmap(problem.W)(ks).astype(dtype)
            W_chol = smallmat.cholesky(Wm)
            W_inv = smallmat.cho_inverse(W_chol)
            logdet_W = smallmat.cho_logdet(W_chol)
            out = candidate_bank(tm, x_ref, l_cand, Lg, mu, theta,
                                 Wm, W_inv, logdet_W, recompute=rec)
            return out.value, out.m_fail
        return jax.vmap(core)(x_ref, l_cand, Lg, mu, theta)

    banked_cv = jax.custom_batching.custom_vmap(banked)

    @banked_cv.def_vmap
    def _flatten_rule(axis_size, in_batched, *args):
        def bc(x, b):
            if b:
                return x
            x = jnp.asarray(x)
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args_b = jax.tree_util.tree_map(bc, args, tuple(in_batched))
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), args_b)
        out = banked_cv(*flat)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((axis_size, -1) + x.shape[1:]), out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    cv = jax.custom_batching.custom_vmap(core)

    @cv.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            if b:
                return x
            x = jnp.asarray(x)
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args_b = jax.tree_util.tree_map(bc, args, tuple(in_batched))
        out = banked_cv(*args_b)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return cv


def candidate_value(problem, x_ref: Array, l_cand: Array, L: Array,
                    mu: Array, theta: Array, *, unroll: int = 1):
    """Evaluate one line-search candidate: ``(value, m_fail)``.

    Unbatched semantics (vmap-able into banks/fleets): closed-loop rollout
    of ``l_cand`` under frozen gains ``L`` around ``x_ref``, quadratize,
    fold, folded evaluating DP.  On TPU, vmapped f32 banks of problems
    with a ``tile_model`` run the whole trial as ONE fused Mosaic kernel.
    """
    return _make_candidate_core(problem, unroll)(
        x_ref, l_cand, L, jnp.asarray(mu, x_ref.dtype),
        jnp.asarray(theta, x_ref.dtype))
