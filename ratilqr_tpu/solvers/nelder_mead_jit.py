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

Design: **speculative batched evaluation**.  Nelder-Mead looks inherently
sequential — each vertex evaluation depends on the previous answer — but
one NM iteration (``step!``, ref :174-252) can only ever evaluate θ's from
a 6-candidate tree that is computable *up front* from the sorted simplex:

  reflect θ_r; expand θ_e(θ_r); contract θ_c with θ_high ∈ {old, θ_r};
  shrink θ_s = (θ_high+θ_low)/2 with the same two θ_high hypotheses.

A vmapped iLEQG bank evaluates all six in ONE pass per iteration — on TPU
a 6-lane bank costs the same wall-clock as one lane (the solve is
latency-bound, not FLOP-bound) — and the transition logic then replays the
reference's decisions over the precomputed answers.  Likewise the
feasibility bootstrap (halve θ until the objective is finite, ref
:283-304) evaluates BOTH vertices' entire 60-step λ-ladders as one
120-lane bank and picks each first finite entry, collapsing up to 120
sequential evaluations into one.  The reference's decision sequence is
reproduced exactly; only the schedule changes.

Two further schedule compressions on the same principle:

  - **Multi-step speculation** (``NelderMeadConfig.speculation_depth``):
    the candidate trees of up to 3 CONSECUTIVE iterations are enumerable
    up front (6 new-vertex hypotheses × 2 sort orders per level → 6 / 78
    / 942 lanes), so one bank buys 3 sequentially dependent rounds; the
    replay walks the realized subtree by group index.
  - **Speculative final solve**: θ_opt = θ_low is always a θ that some
    bank already solved, so each vertex's full solution ``(x, l, L,
    value)`` rides the loop carry and the reference's final re-solve
    (ref :334-346) is replaced by the carried lane — except where no
    lane exists (the stale-c warm path's undisplaced θ_low; kl_bound = 0)
    which falls back to a real solve via ``lax.cond``.  (Batched-caller
    caveat: under ``vmap`` a lax.cond lowers to select-with-both-
    branches, so fleets still pay the fresh solve — the saving applies
    to the unbatched single-dispatch MPC path; the carried pytrees are
    ~2.7 KB/lane, well under the carry-select-traffic threshold
    documented in ``solvers/ileqg.py``.)

Decision-for-decision parity with the host path is pinned by
``tests/test_bilevel.py`` (θ_opt/value/state to 1e-9 in f64), and
``jax.vmap`` of this solve gives a *fleet* of independent NM searches in
one dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ratilqr_tpu.config import NelderMeadConfig
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve
from ratilqr_tpu.solvers.ileqg import solve_via_bank
from ratilqr_tpu.solvers.nelder_mead import (NMResult, NMState,
                                             _MAX_BOOTSTRAP, init_state)

Array = jnp.ndarray


@partial(jax.jit, static_argnums=(0, 1, 2))
def _solve_impl(problem: RiskSensitiveProblem, config: NelderMeadConfig,
                have_c: str, state_arr, x0: Array, u_init: Array,
                kl_bound: Array) -> NMResult:
    dtype = x0.dtype
    kl_bound = jnp.asarray(kl_bound, dtype)
    lam = jnp.asarray(config.lam, dtype)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    (th_hi_init0, th_lo_init0, c_hi_in, c_lo_in) = state_arr

    tsel = lambda pred, a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)
    tpick = lambda sols, k: jax.tree_util.tree_map(lambda a: a[k], sols)

    # Per-lane solution pytree carried for the SPECULATIVE FINAL SOLVE:
    # every θ the simplex can hold was solved inside some bank already, so
    # the reference's final re-solve at θ_opt = θ_low (ref :334-346) is a
    # bit-identical repeat of an existing lane — carry that lane's
    # (x, l, L, raw value) through the loop and skip the extra sequential
    # solve.  ``have`` flags lanes whose solution exists (the stale-c
    # warm path starts without one; θ_opt = 0 never has one) — those fall
    # back to the real final solve via lax.cond.
    T_, n_, m_ = u_init.shape[0], x0.shape[0], u_init.shape[1]
    sol0 = (jnp.zeros((T_ + 1, n_), dtype), jnp.zeros((T_, m_), dtype),
            jnp.zeros((T_, m_, n_), dtype), jnp.zeros((), dtype))

    def bank_eval(thetas):
        """Outer objective ``ileqg_value(θ) + kl_bound/θ`` over a θ-bank,
        failure→Inf masked (``compute_cost_worker``, ref :134-158), plus
        the per-lane solution pytree for the speculative final solve."""
        res = jax.vmap(lambda th: ileqg_solve(problem, config.ileqg, x0,
                                              u_init, th))(thetas)
        cost = res.value + kl_bound / thetas
        # NaN objective = failed solve -> Inf (Inf-masking invariant);
        # keeps all comparisons in the decision replay well-ordered and
        # matches the host path's NaN handling.
        cost = jnp.where(jnp.isnan(cost), jnp.asarray(jnp.inf, dtype),
                         cost)
        return cost, (res.x, res.l, res.L, res.value)

    def ladders():
        ks = lam ** jnp.arange(_MAX_BOOTSTRAP, dtype=dtype)
        return th_hi_init0 * ks, th_lo_init0 * ks

    def bootstrap_from(costs, sols):
        """Decode both vertices' λ-ladder evaluations; first finite wins —
        outcome identical to the reference's sequential halving loop
        (ref :283-304), bounded at ``_MAX_BOOTSTRAP`` halvings.  Pure
        indexing over an already-evaluated bank (no control flow), so it
        stays cheap when a batched caller evaluates the ladders
        unconditionally."""
        ladder_hi, ladder_lo = ladders()
        c_h, c_l = costs[:_MAX_BOOTSTRAP], costs[_MAX_BOOTSTRAP:]

        def first_finite(ladder, cs, init0, lane0):
            ok = jnp.isfinite(cs)
            # First finite entry; on a problem infeasible at EVERY theta,
            # the bounded host loop exhausts at the LAST evaluated rung
            # with its inits halved (_MAX_BOOTSTRAP - 1) times -- match it
            # so warm-started decision parity survives the edge case.
            k = jnp.where(ok.any(), jnp.argmax(ok),
                          i32(_MAX_BOOTSTRAP - 1))
            return (ladder[k], cs[k], init0 * lam ** k.astype(dtype),
                    tpick(sols, lane0 + k))

        th_hi, c_hi, hi_init, sol_hi = first_finite(
            ladder_hi, c_h, th_hi_init0, i32(0))
        th_lo, c_lo, lo_init, sol_lo = first_finite(
            ladder_lo, c_l, th_lo_init0, i32(_MAX_BOOTSTRAP))
        return (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init,
                sol_hi, sol_lo, jnp.bool_(True), jnp.bool_(True))

    def bootstrap():
        ladder_hi, ladder_lo = ladders()
        costs, sols = bank_eval(jnp.concatenate([ladder_hi, ladder_lo]))
        return bootstrap_from(costs, sols)

    S = config.speculation_depth
    TREE = {1: 6, 2: 78, 3: 942}[S]
    offs = (0, 6, 78)

    def cands(lo, hi, lo_init):
        """The 6 θs one ``step!`` can query, from a sorted simplex
        (elementwise over any batch of (lo, hi) pairs): [reflect,
        expand, contract(¬keep_r), contract(keep_r), shrink(¬keep_r),
        shrink(keep_r)] (ref :195-243; shrink is unclamped there)."""
        clamp = lambda th: jnp.maximum(lo_init, th)
        th_r = clamp(lo + config.alpha * (lo - hi))
        th_e = clamp(lo + config.beta * (th_r - lo))
        th_c0 = clamp(lo + config.gamma * (hi - lo))
        th_c1 = clamp(lo + config.gamma * (th_r - lo))
        th_s0 = (hi + lo) / 2.0
        th_s1 = (th_r + lo) / 2.0
        return jnp.stack([th_r, th_e, th_c0, th_c1, th_s0, th_s1],
                         axis=-1)

    def build_tree(lo0, hi0, lo_init):
        """Candidate tree for up to ``speculation_depth`` consecutive
        ``step!``s from the SORTED simplex (lo0, hi0).

        One NM iteration can only ever query 6 θs computable up front;
        chaining over the 6 possible new vertices × 2 sort orders per
        level gives 6 / 78 / 942 lanes at depth 1 / 2 / 3 — depth 3 is
        exactly one (8, 128)-lane Pallas tile, i.e. the same kernel
        wall-clock as a 6-lane bank for one third of the sequentially
        dependent dispatch chain."""
        obit = jnp.asarray([False, True])
        levels = [cands(lo0, hi0, lo_init)]                 # (6,)
        if S >= 2:
            # hypothesis (j, o): new high = level-1 candidate j; o = the
            # next sort swapped it into the low slot.
            lo1 = jnp.where(obit[None, :], levels[0][:, None], lo0)
            hi1 = jnp.where(obit[None, :], lo0, levels[0][:, None])
            t2 = cands(lo1, hi1, lo_init)                   # (6,2,6)
            levels.append(t2.reshape(-1))
        if S >= 3:
            ob = obit.reshape(1, 1, 1, 2)
            cand2 = t2[:, :, :, None]                       # (6,2,6,1)
            lo1e = lo1[:, :, None, None]                    # (6,2,1,1)
            lo2 = jnp.where(ob, cand2, lo1e)                # (6,2,6,2)
            hi2 = jnp.where(ob, lo1e, cand2)
            levels.append(cands(lo2, hi2, lo_init).reshape(-1))  # (864,)
        return jnp.concatenate(levels) if S > 1 else levels[0]

    def replay(tree_thetas, tree_costs, tree_sols, base, carry):
        """Walk the reference's decision sequence (ref :195-244) over a
        precomputed candidate tree starting at lane offset ``base``;
        group index ``g`` tracks which subtree the realized trajectory
        is in.  Values are identical at any depth (same formulas over
        the same operands); a mid-group convergence freezes the
        remaining speculative steps."""
        (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi, sol_lo,
         have_hi, have_lo, it, done) = carry
        g = i32(0)
        for s in range(S):
            swp = c_hi < c_lo
            s_lo = jnp.where(swp, th_hi, th_lo)
            s_hi = jnp.where(swp, th_lo, th_hi)
            s_cl = jnp.where(swp, c_hi, c_lo)
            s_ch = jnp.where(swp, c_lo, c_hi)
            s_sol_lo = tsel(swp, sol_hi, sol_lo)
            s_have_lo = jnp.where(swp, have_hi, have_lo)
            at = base + offs[s] + g * 6
            ths = lax.dynamic_slice(tree_thetas, (at,), (6,))
            cs = lax.dynamic_slice(tree_costs, (at,), (6,))
            c_r, c_e = cs[0], cs[1]

            expand = c_r < s_cl
            e_better = c_e < c_r
            keep_r = ~expand & (c_r < s_ch)
            # (the transient theta_high = theta_r assignment, ref :228, is
            # always overwritten by the contraction outcome -- only its
            # COST feeds the shrink decision, ref :238)
            c_hi2 = jnp.where(keep_r, c_r, s_ch)
            c_c = jnp.where(keep_r, cs[3], cs[2])
            shrink = c_c > c_hi2
            j = jnp.where(
                expand, jnp.where(e_better, i32(1), i32(0)),
                jnp.where(keep_r, jnp.where(shrink, i32(5), i32(3)),
                          jnp.where(shrink, i32(4), i32(2))))
            new_hi, new_ch = ths[j], cs[j]
            cand_sol = tpick(tree_sols, at + j)

            it_new = it + 1
            c_mean = (s_cl + new_ch) / 2.0
            stdev = jnp.sqrt(0.5 * ((new_ch - c_mean) ** 2
                                    + (s_cl - c_mean) ** 2))
            done_new = (stdev < config.eps) | (it_new >= config.iter_max)
            if config.verbose:
                # Per-iteration simplex trace mirroring the reference's
                # verbose prints (ref :181-249); live=False marks masked
                # speculative steps after in-group convergence.
                jax.debug.print(
                    "**NM iter {i}: reflect (th_r, c_r)=({tr:.4g}, "
                    "{cr:.4g}) expand={e} keep_r={k} shrink={s} -> "
                    "simplex (th_lo, c_lo)=({tl:.4g}, {cl:.4g}) "
                    "(th_hi, c_hi)=({th:.4g}, {ch:.4g}) stdev={sd:.4g} "
                    "live={lv}",
                    i=it_new, tr=ths[0], cr=c_r, e=expand, k=keep_r,
                    s=~expand & shrink, tl=s_lo, cl=s_cl, th=new_hi,
                    ch=new_ch, sd=stdev, lv=~done)
            live = ~done
            th_hi = jnp.where(live, new_hi, th_hi)
            th_lo = jnp.where(live, s_lo, th_lo)
            c_hi = jnp.where(live, new_ch, c_hi)
            c_lo = jnp.where(live, s_cl, c_lo)
            sol_hi = tsel(live, cand_sol, sol_hi)
            sol_lo = tsel(live, s_sol_lo, sol_lo)
            have_hi = jnp.where(live, jnp.bool_(True), have_hi)
            have_lo = jnp.where(live, s_have_lo, have_lo)
            it = jnp.where(live, it_new, it)
            done = jnp.where(live, done_new, done)
            # Descend into the realized subtree: o = next round's sort bit.
            o = (new_ch < s_cl).astype(jnp.int32)
            g = (g * 6 + j) * 2 + o
        return (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi,
                sol_lo, have_hi, have_lo, it, done)

    def nm_step(carry):
        """Up to ``speculation_depth`` consecutive ``step!``s (ref
        :174-252) as ONE speculative bank: build the candidate tree from
        the sorted root simplex, evaluate every lane at once, replay."""
        (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi, sol_lo,
         have_hi, have_lo, it, done) = carry
        swap0 = c_hi < c_lo
        lo0 = jnp.where(swap0, th_hi, th_lo)
        hi0 = jnp.where(swap0, th_lo, th_hi)
        tree_thetas = build_tree(lo0, hi0, lo_init)
        tree_costs, tree_sols = bank_eval(tree_thetas)
        return replay(tree_thetas, tree_costs, tree_sols, i32(0), carry)

    def run_nm(_):
        # initialize! (ref :164-168): θ reset from the persistent inits;
        # carried c values (if any) persist verbatim — the reference's
        # ``isnothing`` cross-solve quirk (ref :283,294).  Every branch
        # below produces the full 12-tuple loop carry; the while_loop +
        # return epilogue is shared.
        if have_c == "traced" and not config.refresh_carried_costs:
            # In-graph carried state (episode scans / fleet vmaps).  A
            # lax.cond on a per-lane NaN check would lower to
            # select-with-both-branches under vmap and execute the
            # dormant 120-lane bootstrap ladders on every warm re-plan
            # of every lane, so instead ONE merged bank evaluates both
            # init vertices plus both sort orders' first speculation
            # trees:
            #
            #   [vertex_hi, vertex_lo | tree_a | tree_b]
            #
            # and the loop enters through ``replay`` on the matching
            # tree, exactly as the refresh path does.  With valid
            # carried c this is decision-identical to running the first
            # ``nm_step`` (same tree; the carried costs drive the sort)
            # at the same sequential bank count — the two vertex lanes
            # additionally give real carried solutions, so the
            # speculative final solve covers the never-displaced-θ_low
            # case too.  With the NaN "missing" encoding (a caller who
            # chained a kl_bound==0 solve without ``bootstrap_state`` —
            # round-4 advisor finding), the evaluated vertex costs
            # substitute per vertex, which IS the host feasibility
            # bootstrap whenever the inits are feasible at the first
            # ladder rung (the common case); inits infeasible at rung 0
            # keep Inf vertices that later finite candidates displace
            # (bounded by iter_max) rather than replaying the full
            # halving ladder.
            tree_a = build_tree(th_lo_init0, th_hi_init0, th_lo_init0)
            tree_b = build_tree(th_hi_init0, th_lo_init0, th_lo_init0)
            merged = jnp.concatenate(
                [jnp.stack([th_hi_init0, th_lo_init0]), tree_a, tree_b])
            cs, sols = bank_eval(merged)
            c_hi0 = jnp.where(jnp.isnan(c_hi_in), cs[0], c_hi_in)
            c_lo0 = jnp.where(jnp.isnan(c_lo_in), cs[1], c_lo_in)
            carry0 = (th_hi_init0, th_lo_init0, c_hi0, c_lo0,
                      th_hi_init0, th_lo_init0, tpick(sols, 0),
                      tpick(sols, 1), jnp.bool_(True), jnp.bool_(True),
                      i32(0), jnp.zeros((), bool))
            base = jnp.where(c_hi0 < c_lo0, i32(2 + TREE), i32(2))
            carry = replay(merged, cs, sols, base, carry0)
        elif have_c == "concrete" and not config.refresh_carried_costs:
            # Host-held carried c may be the concrete-NaN "missing"
            # encoding from a kl_bound == 0 solve (see skip_nm).  Decode
            # it IN-GRAPH: a host-side check costs one ~25 ms device_get
            # round trip per warm re-plan on the tunneled runtime;
            # lax.cond runs only the taken branch on this unbatched
            # single-dispatch path, so the bootstrap bank executes
            # exactly when the host path's _missing_c would bootstrap.
            missing = jnp.isnan(c_hi_in) | jnp.isnan(c_lo_in)
            (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi, sol_lo,
             have_hi, have_lo) = lax.cond(
                missing, lambda _: bootstrap(),
                lambda _: (th_hi_init0, th_lo_init0, c_hi_in, c_lo_in,
                           th_hi_init0, th_lo_init0, sol0, sol0,
                           jnp.bool_(False), jnp.bool_(False)), None)
            carry = (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi,
                     sol_lo, have_hi, have_lo, i32(0),
                     jnp.zeros((), bool))
        elif have_c != "none":
            # refresh_carried_costs: ONE branch-free bank covers every
            # outcome — both vertices' full bootstrap λ-ladders (whose
            # FIRST rungs are the refreshed pair itself, ref :283-304)
            # plus both sort orderings' first speculation trees:
            #
            #   [ladder_hi (60) | ladder_lo (60) | tree_a | tree_b]
            #
            # If both refreshed vertices are feasible, the replay runs
            # the first speculation group off the matching tree (the
            # refresh round and the first NM rounds cost ONE dispatch);
            # otherwise the ladder lanes decode into the standard
            # bootstrap.  Both decodes are pure indexing over the same
            # evaluated bank, so a vmapped fleet pays no dormant-branch
            # tax (no lax.cond anywhere on this path).
            ladder_hi, ladder_lo = ladders()
            tree_a = build_tree(th_lo_init0, th_hi_init0, th_lo_init0)
            tree_b = build_tree(th_hi_init0, th_lo_init0, th_lo_init0)
            merged = jnp.concatenate([ladder_hi, ladder_lo, tree_a,
                                      tree_b])
            cs, sols = bank_eval(merged)
            c_hi0, c_lo0 = cs[0], cs[_MAX_BOOTSTRAP]
            both_ok = jnp.isfinite(c_hi0) & jnp.isfinite(c_lo0)

            carry0 = (th_hi_init0, th_lo_init0, c_hi0, c_lo0,
                      th_hi_init0, th_lo_init0, tpick(sols, 0),
                      tpick(sols, _MAX_BOOTSTRAP), jnp.bool_(True),
                      jnp.bool_(True), i32(0), jnp.zeros((), bool))
            # tree_a was built for the unswapped ordering (lo = the
            # θ_low vertex), tree_b for the swapped one; replay's own
            # first-step sort recomputes the same bit.
            base = jnp.where(c_hi0 < c_lo0,
                             i32(2 * _MAX_BOOTSTRAP + TREE),
                             i32(2 * _MAX_BOOTSTRAP))
            refreshed = replay(merged, cs, sols, base, carry0)
            boot = bootstrap_from(cs, sols) + (i32(0),
                                               jnp.zeros((), bool))
            carry = tsel(both_ok, refreshed, boot)
        else:
            carry = bootstrap() + (i32(0), jnp.zeros((), bool))
        carry = lax.while_loop(lambda c: ~c[-1], nm_step, carry)
        (th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, sol_hi, sol_lo,
         have_hi, have_lo, it, _) = carry
        theta_opt = th_lo
        return (theta_opt, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init,
                it, sol_lo, have_lo)

    def skip_nm(_):
        # kl_bound == 0 → pure iLQG; NM state untouched beyond the reset.
        # With no carried costs, c stays "missing" — encoded NaN, decoded
        # back to None by the wrapper so a later kl_bound>0 call still
        # bootstraps (the host path's None-preserving behavior).
        missing = jnp.asarray(jnp.nan, dtype)
        return (jnp.asarray(0.0, dtype), th_hi_init0, th_lo_init0,
                c_hi_in if have_c != "none" else missing,
                c_lo_in if have_c != "none" else missing,
                th_hi_init0, th_lo_init0, i32(0), sol0, jnp.bool_(False))

    (theta_opt, th_hi, th_lo, c_hi, c_lo, hi_init, lo_init, it, sol_lo,
     have_lo) = lax.cond(kl_bound > 0, run_nm, skip_nm, None)

    # Final re-solve at θ_opt — deliberately NO retry loop, matching the
    # reference (ref :334-346; unlike RAT iLQR's backoff).  SPECULATIVE:
    # θ_opt = θ_low was already solved as a lane of some bank (its carried
    # solution pytree rides the loop), and a fresh solve at identical
    # inputs is lane-for-lane the same computation — so the extra
    # sequential solve is skipped whenever the carried solution exists.
    # Fallbacks through lax.cond: the stale-c warm path whose θ_low was
    # never displaced (its cost is carried but its solution was never
    # computed this call) and the kl_bound == 0 pure-iLQG path (θ_opt = 0
    # is never a bank lane).  Routed through a 1-lane bank so the DP
    # passes take the Pallas kernel on TPU (solve_via_bank).
    def fresh_solve(_):
        r = solve_via_bank(problem, config.ileqg, x0, u_init, theta_opt)
        return r.x, r.l, r.L, r.value

    x_f, l_f, L_f, raw_value = lax.cond(
        have_lo & (kl_bound > 0), lambda _: sol_lo, fresh_solve, None)
    value = jnp.where(kl_bound > 0, raw_value + kl_bound / theta_opt,
                      raw_value)
    new_state = NMState(theta_high_init=hi_init, theta_low_init=lo_init,
                        theta_high=th_hi, theta_low=th_lo,
                        c_high=c_hi, c_low=c_lo, iter_current=it)
    return NMResult(theta_opt=theta_opt, x=x_f, l=l_f, L=L_f,
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
    if (not isinstance(kl_bound, jax.core.Tracer)
            and float(kl_bound) < 0):
        raise ValueError("KL divergence bound must be non-negative")

    # ``have_c`` is structural, three-valued: "none" (fresh host state →
    # bootstrap), "concrete" (host-held carried values — may be the
    # concrete-NaN "missing" encoding from a kl_bound == 0 solve, decoded
    # IN-GRAPH by ``run_nm``'s lax.cond so this wrapper does zero device
    # work; a host-side check costs one ~25 ms device_get round trip per
    # warm re-plan on the tunneled backend), or "traced" (in-graph state
    # inside a scan/vmap — episode fleets — where the values are REQUIRED
    # to be a real bootstrapped state, see ``bootstrap_state``: a per-lane
    # NaN cond would lower to select-with-both-branches under vmap and run
    # the dormant 120-lane bootstrap on every warm re-plan of every lane).
    ch, cl = state.c_high, state.c_low
    if ch is None or cl is None:
        have_c = "none"
    elif any(isinstance(v, jax.core.Tracer) for v in (ch, cl)):
        have_c = "traced"
    else:
        have_c = "concrete"

    def _h(v):
        # Cast to the solve dtype without host round trips: device arrays
        # and tracers get an (elided-when-noop) astype; fresh init_state
        # fields are Python floats.
        if isinstance(v, (jax.Array, jax.core.Tracer)):
            return v if v.dtype == dtype else v.astype(dtype)
        return np.asarray(v, dtype)

    zero = np.zeros((), dtype)
    state_arr = (_h(state.theta_high_init), _h(state.theta_low_init),
                 _h(ch) if have_c != "none" else zero,
                 _h(cl) if have_c != "none" else zero)
    return _solve_impl(problem, config, have_c, state_arr, x0, u_init,
                       kl_bound)


def bootstrap_state(problem: RiskSensitiveProblem, config: NelderMeadConfig,
                    x0, u_init, *, kl_bound) -> NMState:
    """All-array :class:`NMState` for scan-carry use (episode banks,
    ``mpc_episode.make_nm_plan``): runs one full solve from the fresh
    state — the feasibility bootstrap executes and its carried
    ``c_high/c_low`` become concrete arrays — and returns the resulting
    warm-start state.

    ``kl_bound`` must be a concrete positive value: ``kl_bound == 0``
    degenerates to pure iLQG (ref :386-389), whose returned state keeps
    the NaN "missing" c encoding — useless as a scan carry (the in-scan
    solve would treat NaN costs as real and never converge)."""
    if float(kl_bound) <= 0:
        raise ValueError(
            "bootstrap_state requires kl_bound > 0: the kl_bound == 0 "
            "path skips the feasibility bootstrap, so c_high/c_low stay "
            "missing and the state is not a valid episode scan carry")
    return solve(problem, config, init_state(config), x0, u_init,
                 kl_bound=kl_bound).state
