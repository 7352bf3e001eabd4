"""Fully-jitted RAT iLQR++: the whole Nelder-Mead bilevel solve as ONE
device program.

The host-orchestrated path (``ratilqr_tpu.solvers.nelder_mead``) mirrors
the reference's sequential control flow
(``/root/reference/src/nelder_mead_bilevel_optimization.jl:276-352``) and
pays one host↔device round trip per vertex cost evaluation — typically
10-40 per solve.  On the tunneled TPU runtime each round trip costs
~27 ms, so dispatch overhead alone dwarfs the compute.  This module
compiles the entire ``solve!`` — feasibility bootstrap, the NM
reflect/expand/contract/shrink iteration, convergence test, final re-solve
— into a single jitted function: one dispatch per MPC re-plan.

Design: a **batched state machine**, not a nest of ``lax.cond`` branches.
Nelder-Mead is a sequence of scalar cost queries ``θ → c(θ)`` where each
query's θ depends on all previous answers.  The solve is therefore one
``lax.while_loop`` whose body (a) evaluates the cost at the current query
θ — the ONLY inlined iLEQG instance in the loop — and (b) runs a small
branchless transition table (phases BOOT_HI → BOOT_LO → REFLECT →
EXPAND/CONTRACT → SHRINK) that reproduces the reference's decision
sequence exactly (ref :283-304 bootstrap, :174-252 ``step!``,
:306-323 convergence).  Compared to inlining one iLEQG program per branch
this compiles ~3× faster, evaluates exactly as many iLEQG solves as the
host path, and — because every lane carries its own phase — ``jax.vmap``
turns it into a *fleet* of independent NM searches in one dispatch.

Decision-for-decision parity with the host path is pinned by
``tests/test_bilevel.py`` (θ_opt/value/state to 1e-9 in f64).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.config import NelderMeadConfig
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve
from ratilqr_tpu.solvers.nelder_mead import NMResult, NMState

Array = jnp.ndarray

_MAX_BOOTSTRAP = 60  # halvings: spans ~18 orders of magnitude of θ

# Automaton phases (the θ just evaluated was ...)
_BOOT_HI = 0   # ... θ_high during the feasibility bootstrap (ref :283-293)
_BOOT_LO = 1   # ... θ_low during the feasibility bootstrap (ref :294-304)
_REFLECT = 2   # ... θ_r (ref :195-197)
_EXPAND = 3    # ... θ_e (ref :202-222)
_CONTRACT = 4  # ... θ_c (ref :232-243)
_SHRINK = 5    # ... (θ_high+θ_low)/2 after a failed contraction (ref :238-243)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _solve_impl(problem: RiskSensitiveProblem, config: NelderMeadConfig,
                have_c: bool, state_arr, x0: Array, u_init: Array,
                kl_bound: Array) -> NMResult:
    dtype = x0.dtype
    kl_bound = jnp.asarray(kl_bound, dtype)
    lam = jnp.asarray(config.lam, dtype)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    (th_hi_init0, th_lo_init0, c_hi_in, c_lo_in) = state_arr

    def cost(theta):
        """Outer objective with failure→Inf masking
        (``compute_cost_worker``, ref :134-158)."""
        res = ileqg_solve(problem, config.ileqg, x0, u_init, theta)
        return res.value + kl_bound / theta

    # Carry layout: phase + simplex + persistent inits + the current query,
    # plus per-iteration temporaries (θ_m, θ_r, c_r survive across phases
    # of one NM step).
    def start_iteration(th_hi, th_lo, c_hi, c_lo, lo_init, it):
        """Sort the simplex and emit the reflection query (ref :184-197)."""
        swap = c_hi < c_lo
        th_lo, th_hi = (jnp.where(swap, th_hi, th_lo),
                        jnp.where(swap, th_lo, th_hi))
        c_lo, c_hi = (jnp.where(swap, c_hi, c_lo),
                      jnp.where(swap, c_lo, c_hi))
        theta_m = th_lo
        theta_r = jnp.maximum(lo_init,
                              theta_m + config.alpha * (theta_m - th_hi))
        return (th_hi, th_lo, c_hi, c_lo, theta_m, theta_r, it + 1)

    def body(carry):
        (phase, query, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init,
         theta_m, theta_r, c_r, it, done, evals) = carry
        c = cost(query)                      # the single iLEQG instance
        finite = jnp.isfinite(c)

        # --- bootstrap transitions (ref :283-304) ------------------------
        # On failure both θ and its persistent init shrink by λ; on success
        # the answer becomes the vertex cost and the automaton advances.
        in_bhi = phase == _BOOT_HI
        in_blo = phase == _BOOT_LO
        shrink_b = (in_bhi | in_blo) & ~finite
        th_hi = jnp.where(in_bhi & ~finite, th_hi * lam, th_hi)
        hi_init = jnp.where(in_bhi & ~finite, hi_init * lam, hi_init)
        th_lo = jnp.where(in_blo & ~finite, th_lo * lam, th_lo)
        lo_init = jnp.where(in_blo & ~finite, lo_init * lam, lo_init)
        c_hi = jnp.where(in_bhi & finite, c, c_hi)
        c_lo = jnp.where(in_blo & finite, c, c_lo)

        # --- step! transitions (ref :174-252) ----------------------------
        in_r = phase == _REFLECT
        # reflection beats the best vertex → expansion query (ref :202)
        to_expand = in_r & (c < c_lo)
        # otherwise maybe keep the reflection, then contract (ref :227-234)
        keep_r = in_r & ~to_expand & (c < c_hi)
        th_hi = jnp.where(keep_r, query, th_hi)
        c_hi = jnp.where(keep_r, c, c_hi)

        in_e = phase == _EXPAND
        # keep the better of expansion/reflection (ref :210-222)
        e_better = in_e & (c < c_r)
        th_hi = jnp.where(e_better, query, jnp.where(in_e, theta_r, th_hi))
        c_hi = jnp.where(e_better, c, jnp.where(in_e, c_r, c_hi))

        in_c = phase == _CONTRACT
        # failed contraction → shrink query; else keep θ_c (ref :236-244)
        to_shrink = in_c & (c > c_hi)
        th_hi = jnp.where(in_c & ~to_shrink, query, th_hi)
        c_hi = jnp.where(in_c & ~to_shrink, c, c_hi)

        in_s = phase == _SHRINK
        th_hi = jnp.where(in_s, query, th_hi)
        c_hi = jnp.where(in_s, c, c_hi)

        # --- where to next ----------------------------------------------
        c_r = jnp.where(in_r, c, c_r)
        theta_r_new = theta_r  # set at iteration start below
        end_iter = in_e | (in_c & ~to_shrink) | in_s
        boot_hi_done = in_bhi & finite
        boot_lo_done = in_blo & finite

        # Convergence test after a completed step (ref :306-323).
        c_mean = (c_lo + c_hi) / 2.0
        stdev = jnp.sqrt(0.5 * ((c_hi - c_mean) ** 2
                                + (c_lo - c_mean) ** 2))
        converged = end_iter & ((stdev < config.eps)
                                | (it >= config.iter_max))
        start_new = (boot_lo_done | end_iter) & ~converged

        (s_th_hi, s_th_lo, s_c_hi, s_c_lo, s_theta_m, s_theta_r,
         s_it) = start_iteration(th_hi, th_lo, c_hi, c_lo, lo_init, it)
        th_hi = jnp.where(start_new, s_th_hi, th_hi)
        th_lo = jnp.where(start_new, s_th_lo, th_lo)
        c_hi = jnp.where(start_new, s_c_hi, c_hi)
        c_lo = jnp.where(start_new, s_c_lo, c_lo)
        theta_m = jnp.where(start_new, s_theta_m, theta_m)
        theta_r_new = jnp.where(start_new, s_theta_r, theta_r_new)
        it = jnp.where(start_new, s_it, it)

        theta_e = jnp.maximum(lo_init,
                              theta_m + config.beta * (query - theta_m))
        theta_c = jnp.maximum(lo_init,
                              theta_m + config.gamma * (th_hi - theta_m))
        theta_s = (th_hi + th_lo) / 2.0

        next_phase = jnp.where(
            shrink_b, phase,
            jnp.where(boot_hi_done, i32(_BOOT_LO),
            jnp.where(start_new, i32(_REFLECT),
            jnp.where(to_expand, i32(_EXPAND),
            jnp.where(in_r & ~to_expand, i32(_CONTRACT),
            jnp.where(to_shrink, i32(_SHRINK), phase))))))
        next_query = jnp.where(
            shrink_b & in_bhi, th_hi,
            jnp.where(shrink_b & in_blo, th_lo,
            jnp.where(boot_hi_done, th_lo,
            jnp.where(start_new, theta_r_new,
            jnp.where(to_expand, theta_e,
            jnp.where(in_r & ~to_expand, theta_c,
            jnp.where(to_shrink, theta_s, query)))))))
        done = done | converged
        return (next_phase, next_query, th_hi, th_lo, c_hi, c_lo,
                hi_init, lo_init, theta_m, theta_r_new, c_r, it, done,
                evals + 1)

    max_evals = 2 * _MAX_BOOTSTRAP + 3 * (config.iter_max + 1)

    def keep_going(carry):
        done, evals = carry[-2], carry[-1]
        return ~done & (evals < max_evals)

    def run_nm(_):
        # initialize! (ref :164-168): θ reset from the persistent inits;
        # carried c values (if any) persist verbatim — the reference's
        # ``isnothing`` cross-solve quirk (ref :283,294).
        zero = jnp.zeros((), dtype)
        if have_c:
            # Bootstraps skipped: enter the first NM step directly.
            (th_hi, th_lo, c_hi, c_lo, theta_m, theta_r,
             it) = start_iteration(th_hi_init0, th_lo_init0, c_hi_in,
                                   c_lo_in, th_lo_init0, i32(0))
            carry = (i32(_REFLECT), theta_r, th_hi, th_lo, c_hi, c_lo,
                     th_hi_init0, th_lo_init0, theta_m, theta_r, zero, it,
                     jnp.zeros((), bool), i32(0))
        else:
            inf = jnp.asarray(jnp.inf, dtype)
            carry = (i32(_BOOT_HI), th_hi_init0, th_hi_init0, th_lo_init0,
                     inf, inf, th_hi_init0, th_lo_init0, zero, zero, zero,
                     i32(0), jnp.zeros((), bool), i32(0))
        (_, _, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, _, _, _, it,
         _, _) = lax.while_loop(keep_going, body, carry)
        return th_lo, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, it

    def skip_nm(_):
        # kl_bound == 0 → pure iLQG; NM state untouched beyond the reset.
        # With no carried costs, c stays "missing" — encoded NaN, decoded
        # back to None by the wrapper so a later kl_bound>0 call still
        # bootstraps (the host path's None-preserving behavior).
        missing = jnp.asarray(jnp.nan, dtype)
        return (jnp.asarray(0.0, dtype), th_hi_init0, th_lo_init0,
                c_hi_in if have_c else missing,
                c_lo_in if have_c else missing,
                th_hi_init0, th_lo_init0, i32(0))

    (theta_opt, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init,
     it) = lax.cond(kl_bound > 0, run_nm, skip_nm, None)

    # Final re-solve at θ_opt — deliberately NO retry loop, matching the
    # reference (ref :334-346; unlike RAT iLQR's backoff).
    res = ileqg_solve(problem, config.ileqg, x0, u_init, theta_opt)
    value = jnp.where(kl_bound > 0, res.value + kl_bound / theta_opt,
                      res.value)
    new_state = NMState(theta_high_init=hi_init, theta_low_init=lo_init,
                        theta_high=th_hi, theta_low=th_lo,
                        c_high=c_hi, c_low=c_lo, iter_current=it)
    return NMResult(theta_opt=theta_opt, x=res.x, l=res.l, L=res.L,
                    value=value, state=new_state)


def solve(problem: RiskSensitiveProblem, config: NelderMeadConfig,
          state: NMState, x0: Array, u_init: Array, *,
          kl_bound) -> NMResult:
    """Single-dispatch RAT iLQR++ ``solve!`` (ref :276-352).

    Accepts the same :class:`NMState` as the host path — ``c_high/c_low``
    may be ``None`` (fresh state: the feasibility bootstrap runs) or
    carried values from a previous solve (bootstrap skipped, the
    reference's cross-solve quirk).  ``kl_bound`` is traced; 0 degenerates
    to pure iLQG.  Returns :class:`NMResult` with an all-array
    :class:`NMState` ready for the next warm-started call.
    """
    dtype = x0.dtype

    def _missing(c):
        if c is None:
            return True
        c = jnp.asarray(c)
        # Concrete NaN = "missing" round-tripped through a kl_bound==0
        # solve's returned state (see skip_nm).
        return not isinstance(c, jax.core.Tracer) and bool(jnp.isnan(c))

    have_c = not (_missing(state.c_high) or _missing(state.c_low))
    zero = jnp.zeros((), dtype)
    state_arr = (jnp.asarray(state.theta_high_init, dtype),
                 jnp.asarray(state.theta_low_init, dtype),
                 jnp.asarray(state.c_high, dtype) if have_c else zero,
                 jnp.asarray(state.c_low, dtype) if have_c else zero)
    return _solve_impl(problem, config, have_c, state_arr, x0, u_init,
                       kl_bound)
