"""Pallas TPU kernel: FUSED iLEQG step — rollout + quadratize + optimizing DP.

Round-5 continuation of the fused-candidate attack (``candidate_pallas.py``)
on the *optimizing* side of the iteration.  The forced-iteration audit
(``benchmarks/iteration_audit.py``, docs/performance.md "Where the warm
residual actually goes") measured one warm outer iteration at 30.8–33.4 ms
against a ~21.6 ms component sum at B=65,536: ~10 ms/iteration is
stage-boundary materialization — the open-loop rollout stacks and the
40-float/step approximation stack are written to HBM purely to cross into
the optimizing-DP custom call (``solvers/ileqg.py _step``; reference loop
``/root/reference/src/ileqg.jl:598-613``).  This kernel runs the whole
step-side pipeline as ONE Mosaic program:

  - **Grid** ``(lane_tiles, 2T)``: steps ``0..T-1`` roll the nominal
    trajectory forward (open loop: ``u_t = l_t``), writing ``x`` into the
    (VMEM-resident) trajectory output; steps ``T..2T-1`` run the
    policy-OPTIMIZING backward recursion of ``riccati_pallas.
    _riccati_kernel`` — recomputing the model Jacobians and cost
    quadratization per step from the stored ``x`` and the re-walked ``l``
    input instead of storing a 40-float/step stack (VMEM ≈ 4.6 MB at
    unicycle T=100 vs 16.4 MB stored; the TileModel derivative formulas
    are a few VPU ops against ~730 unit ops of DP algebra per step-lane).
  - **HBM traffic**: ``l (m)`` in (fetched twice — forward and backward
    walks), ``x (n) + L (m·n) + dl (m)`` out ≈ 15 floats/step/lane for
    the unicycle vs >120 for the XLA composition (rollout stacks +
    approximation stack written then re-read by the DP custom call).
  - **μ-restarts** (``ileqg.jl:358-401``) stay OUTSIDE the kernel in the
    shared ``mu_restart_loop`` harness, exactly like the non-fused path;
    a restart re-runs the forward phase too (the rollout is μ-independent
    and deterministic, so results are bit-identical — only restart-lane
    work is duplicated, and warm MPC re-plans restart rarely).
  - **Semantics**: identical to ``rollout_open_loop_with_jac`` +
    ``approximate_model`` + the slim optimizing ``_riccati_core`` pass
    (``ileqg.jl:341-406``); the TileModel must equal the AD derivatives
    (pinned by ``tests/test_candidate_fused.py``), and kernel-vs-XLA
    equality is pinned by ``tests/test_step_fused.py``.
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


def fits_vmem_step(n: int, m: int, T: int) -> bool:
    """Whether the fused step's VMEM residency fits the budget.

    Resident blocks: the whole nominal trajectory ``(T+1)·n`` plus the
    windowed ``L``/``dl`` output buffers and carries (bounded by one
    extra ``m·n + m + n² + n`` per lane — charged as 2 steps of slack).
    """
    budget = int(os.environ.get("RATILQR_STEP_VMEM_BYTES",
                                str(10 * 1024 * 1024)))
    per_lane = (T + 1) * n + 2 * (m * n + m + n * n + n + m * m)
    return per_lane * LANES * 4 <= budget


class StepOut(NamedTuple):
    x: Array       # (B, T+1, n) nominal trajectory (open-loop rollout of l)
    value: Array   # (B,)        cost-to-go at the initial time
    L: Array       # (B, T, m, n) optimizing gains
    dl: Array      # (B, T, m)    optimizing offsets
    m_fail: Array  # (B,) bool    neurotic breakdown (non-PSD M)
    h_fail: Array  # (B,) bool    μ-restart request (non-PSD H)


def _step_opt_kernel(tm, T, n, m, *refs):
    (l_ref, x0_ref, W_ref, Wi_ref, ldW_ref, theta_ref, mu_ref,
     x_out, val_ref, L_out, dl_out, mfail_ref, hfail_ref,
     S_sc, svec_sc, s_sc, mfail_sc, hfail_sc) = refs

    ti = pl.program_id(1)
    theta = theta_ref[...]
    mu = mu_ref[...]

    @pl.when(ti == 0)
    def _init():
        x_out[0] = x0_ref[...]
        mfail_sc[...] = jnp.zeros_like(mfail_sc)
        hfail_sc[...] = jnp.zeros_like(hfail_sc)

    @pl.when(ti < T)
    def _forward():
        # Open-loop rollout: u_t = l_t (rollout_open_loop, ileqg.jl:62-71).
        # The Jacobians are recomputed in the backward phase; Mosaic
        # dead-code-eliminates the unused A/B here.
        x = x_out[ti]
        u = l_ref[...]
        x_next, _, _ = tm.f_jac_tile(x, u)
        x_out[ti + 1] = x_next

        @pl.when(ti == T - 1)
        def _terminal():
            qT, qvT, QT = tm.term_tile(x_next)
            s_sc[...] = qT
            svec_sc[...] = qvT
            S_sc[...] = QT

    @pl.when(ti >= T)
    def _backward():
        # Policy-optimizing DP step (riccati_pallas._riccati_kernel,
        # optimizing/slim/w_shared branch; ileqg.jl:341-406), with the
        # per-step model blocks recomputed from (x_t, l_t) instead of
        # streamed from HBM.
        t = 2 * T - 1 - ti
        x = x_out[t]
        u = l_ref[...]
        _, A, B = tm.f_jac_tile(x, u)
        q, q_vec, Q, r, R, P = tm.quad_tile(t, x, u)

        theta_is_zero = theta == 0.0
        theta_safe = jnp.where(theta_is_zero, jnp.ones_like(theta), theta)

        S = S_sc[...]
        s_vec = svec_sc[...]
        s = s_sc[...]
        m_fail = mfail_sc[...]
        h_fail = hfail_sc[...]
        failed = (m_fail + h_fail) > 0.0

        # M = W⁻¹ − θ S'  (ileqg.jl:365); shared noise model via SMEM.
        M = _sym(_mat([[Wi_ref[i, j] - theta * S[i, j] for j in range(n)]
                       for i in range(n)]))
        M_chol = _chol(M)
        rinv_M = _rinv_diag(M_chol)
        m_ok = _chol_ok_mask(M_chol)
        m_fail = jnp.where(~failed & ~m_ok, 1.0, m_fail)

        MinvS = _cho_solve_mat(M_chol, S, rinv_M)
        eye_b = [[jnp.where(jnp.bool_(i == j), jnp.ones_like(theta),
                            jnp.zeros_like(theta)) for j in range(n)]
                 for i in range(n)]
        D = _mat(eye_b) + theta[None, None] * _t(MinvS)
        DS = _mmul(D, S)

        Bt = _t(B)
        g = r + _mvec(Bt, _mvec(D, s_vec))                 # ileqg.jl:368
        G = P + _mmul(_mmul(Bt, DS), A)                    # ileqg.jl:369
        eye_m = _mat([[jnp.where(jnp.bool_(i == j), mu,
                                 jnp.zeros_like(mu))
                       for j in range(m)] for i in range(m)])
        H = _sym(R + _mmul(_mmul(Bt, DS), B) + eye_m)      # ileqg.jl:370-371

        H_chol = _chol(H)
        rinv_H = _rinv_diag(H_chol)
        h_ok = _chol_ok_mask(H_chol)
        h_fail = jnp.where(~failed & ~(m_fail > 0) & ~h_ok, 1.0, h_fail)
        L = -_cho_solve_mat(H_chol, G, rinv_H)             # ileqg.jl:379
        dl = -_cho_solve_vec(H_chol, g, rinv_H)            # ileqg.jl:381

        Hdl = _mvec(H, dl)
        s_new = q + s + 0.5 * _dot(dl, Hdl) + _dot(dl, g)  # ileqg.jl:383
        Minv_svec = _cho_solve_vec(M_chol, s_vec, rinv_M)
        logdet_M = _cho_logdet(M_chol)
        risk_neutral = 0.5 * sum(W_ref[i, j] * S[j, i]
                                 for i in range(n) for j in range(n))
        logdet_W = ldW_ref[0, 0]
        risk_sensitive = (0.5 * theta * _dot(s_vec, Minv_svec)
                          - (logdet_W + logdet_M) / (2.0 * theta_safe))
        s_new = s_new + jnp.where(theta_is_zero, risk_neutral,
                                  risk_sensitive)

        Lt = _t(L)
        s_vec_new = (q_vec + _mvec(_t(A), _mvec(D, s_vec)) + _mvec(Lt, Hdl)
                     + _mvec(Lt, g) + _mvec(_t(G), dl))    # ileqg.jl:389
        S_new = _sym(Q + _mmul(_mmul(_t(A), DS), A)
                     + _mmul(Lt, _mmul(H, L))
                     + _mmul(Lt, G) + _mmul(_t(G), L))     # ileqg.jl:390-391

        L_out[...] = L
        dl_out[...] = dl
        val_ref[...] = s_new            # last write (t = 0) wins
        mfail_ref[...] = m_fail
        hfail_ref[...] = h_fail

        S_sc[...] = S_new
        svec_sc[...] = s_vec_new
        s_sc[...] = s_new
        mfail_sc[...] = m_fail
        hfail_sc[...] = h_fail


def step_optimize_bank(tile_model, x0_b: Array, l_b: Array, theta_b: Array,
                       mu_b: Array, W: Array, W_inv: Array,
                       logdet_W: Array) -> StepOut:
    """Run the fused rollout+quadratize+optimizing-DP step for a bank.

    Args:
      tile_model: the problem's :class:`TileModel` (static).
      x0_b: ``(B, n)`` initial states.
      l_b: ``(B, T, m)`` committed control schedules.
      theta_b, mu_b: ``(B,)`` per-lane risk sensitivity / regularization.
      W, W_inv, logdet_W: lane-invariant noise model ``(T, n, n)``/``(T,)``
        streamed through SMEM (W depends only on the problem).
    """
    B, T = l_b.shape[0], l_b.shape[1]
    n = x0_b.shape[-1]
    m = l_b.shape[-1]
    dtype = x0_b.dtype
    B_pad = max(LANES, ((B + LANES - 1) // LANES) * LANES)
    tiles = B_pad // LANES
    S8, L8 = LANE_TILE
    T2 = 2 * T

    def prep(x):
        return _to_lanes(jnp.asarray(x, dtype), B_pad)

    def both_ways_spec(*dims):
        """Windowed per-lane input walked forward (rollout) then backward
        (DP) — the block is refetched on the way back."""
        blk = (None,) + dims + (None, S8, L8)

        def imap(bi, ti):
            t = jnp.where(ti < T, ti, T2 - 1 - ti)
            return (t,) + (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def bwd_spec(*dims):
        """Windowed per-lane block parked at T-1 during the forward phase,
        walked backward during the DP phase (outputs: written once per
        time block, flushed on the index change)."""
        blk = (None,) + dims + (None, S8, L8)

        def imap(bi, ti):
            return ((jnp.clip(T2 - 1 - ti, 0, T - 1),)
                    + (0,) * len(dims) + (bi, 0, 0))
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def lane_spec(*dims):
        blk = dims + (None, S8, L8)

        def imap(bi, ti):
            return (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def whole_spec(*dims):
        """The full array resident in VMEM for one lane tile (the nominal
        trajectory: written forward, read at random t backward)."""
        blk = dims + (None, S8, L8)

        def imap(bi, ti):
            return (0,) * len(dims) + (bi, 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def w_spec(*dims):
        """SMEM noise-model slice, walked backward during the DP phase."""
        blk = (None,) + dims

        def imap(bi, ti):
            return (jnp.clip(T2 - 1 - ti, 0, T - 1),) + (0,) * len(dims)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.SMEM)

    # x0: (B, n) -> (n, tiles, 8, 128) via _to_lanes on (B, 1, n).
    inputs = [prep(l_b),
              _to_lanes(x0_b[:, None, :], B_pad)[0],
              jnp.asarray(W, dtype), jnp.asarray(W_inv, dtype),
              jnp.asarray(logdet_W, dtype).reshape(T, 1, 1),
              _to_lanes(theta_b.astype(dtype)[:, None], B_pad)[0],
              _to_lanes(mu_b.astype(dtype)[:, None], B_pad)[0]]
    in_specs = [both_ways_spec(m), lane_spec(n),
                w_spec(n, n), w_spec(n, n), w_spec(1, 1),
                lane_spec(), lane_spec()]

    out_shapes = (
        jax.ShapeDtypeStruct((T + 1, n, tiles, S8, L8), dtype),  # x
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),            # value
        jax.ShapeDtypeStruct((T, m, n, tiles, S8, L8), dtype),   # L
        jax.ShapeDtypeStruct((T, m, tiles, S8, L8), dtype),      # dl
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),            # m_fail
        jax.ShapeDtypeStruct((tiles, S8, L8), dtype),            # h_fail
    )
    out_specs = (whole_spec(T + 1, n), lane_spec(),
                 bwd_spec(m, n), bwd_spec(m),
                 lane_spec(), lane_spec())

    scratch = [
        pltpu.VMEM((n, n, S8, L8), dtype),   # S carry
        pltpu.VMEM((n, S8, L8), dtype),      # s_vec carry
        pltpu.VMEM((S8, L8), dtype),         # s carry
        pltpu.VMEM((S8, L8), dtype),         # m_fail mask
        pltpu.VMEM((S8, L8), dtype),         # h_fail mask
    ]

    call = pl.pallas_call(
        functools.partial(_step_opt_kernel, tile_model, T, n, m),
        grid=(tiles, T2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )
    with jax.enable_x64(False):
        x, val, L, dl, mfail, hfail = call(*inputs)

    unl = lambda a: _from_lanes(a, B)
    scalar = lambda a: _from_lanes(a[None], B)[:, 0]
    return StepOut(x=unl(x), value=scalar(val), L=unl(L), dl=unl(dl),
                   m_fail=scalar(mfail) > 0, h_fail=scalar(hfail) > 0)


# --- dispatch: unbatched semantics + bank/fleet batching rules -----------

from functools import lru_cache  # noqa: E402

from ratilqr_tpu.ops.riccati import (MAX_MU_RESTARTS, _core_dispatch,  # noqa: E402
                                     _pallas_eligible, mu_restart_loop)


@lru_cache(maxsize=128)
def _make_step_core(problem, unroll: int):
    """custom_vmap-wrapped fused step for one problem.

    Per-example semantics = the XLA composition the solver runs today
    (``rollout_open_loop_with_jac`` + ``approximate_model`` + one slim
    optimizing Riccati pass — whose own dispatch takes the Riccati Pallas
    kernel for vmapped banks); a vmapped bank on TPU with a ``tile_model``
    takes the fused kernel instead.  Nested vmap levels flatten into one
    lane axis exactly as in ``candidate_pallas._make_candidate_core``.
    """
    from ratilqr_tpu.ops import smallmat
    from ratilqr_tpu.ops.approx import approximate_model
    from ratilqr_tpu.ops.rollout import rollout_open_loop_with_jac

    tm = problem.tile_model

    def core(x0, l, theta, mu):
        x, A, B = rollout_open_loop_with_jac(problem, x0, l, unroll=unroll)
        approx = approximate_model(problem, l, x, A, B)
        value, L, dl, m_fail, h_fail = _core_dispatch(
            approx, theta, mu, None, None, unroll, slim=True)
        return x, value, L, dl, m_fail, h_fail

    def banked(x0_b, l_b, theta_b, mu_b):
        axis_size = theta_b.shape[0]
        T = l_b.shape[1]
        n = x0_b.shape[-1]
        m = l_b.shape[-1]
        dtype = x0_b.dtype
        if (tm is not None and fits_vmem_step(n, m, T)
                and _pallas_eligible(axis_size, dtype)):
            ks = jnp.arange(T)
            Wm = jax.vmap(problem.W)(ks).astype(dtype)
            W_chol = smallmat.cholesky(Wm)
            W_inv = smallmat.cho_inverse(W_chol)
            logdet_W = smallmat.cho_logdet(W_chol)
            out = step_optimize_bank(tm, x0_b, l_b, theta_b, mu_b,
                                     Wm, W_inv, logdet_W)
            return tuple(out)
        return jax.vmap(core)(x0_b, l_b, theta_b, mu_b)

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


def step_optimize(problem, x0: Array, l: Array, *, theta: Array, mu: Array,
                  delta: Array, mu_min: float, delta_0: float,
                  max_restarts: int = MAX_MU_RESTARTS, unroll: int = 1):
    """Fused step-side pipeline with the μ-restart retry loop.

    Semantically identical to the solver's default composition
    (``rollout_open_loop_with_jac`` → ``approximate_model`` →
    ``dp_optimize(slim=True)``): returns ``(x, value, L, dl, mu, delta,
    failed)``.  A μ-restart re-runs the whole fused program (the rollout
    part is μ-independent, so the extra work changes nothing).
    """
    dtype = x0.dtype
    theta = jnp.asarray(theta, dtype)
    mu = jnp.asarray(mu, dtype)
    delta = jnp.asarray(delta, dtype)
    core_cv = _make_step_core(problem, unroll)

    def run(mu_v):
        return core_cv(x0, l, theta, mu_v)

    return mu_restart_loop(run, mu, delta, mu_min, delta_0, max_restarts)
