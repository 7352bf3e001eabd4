"""iLQG / iLEQG trust-region trajectory optimizer.

TPU-native counterpart of ``ILEQGSolver`` and its ``initialize!`` /
``step!`` / ``line_search!`` / ``solve!`` loop
(``/root/reference/src/ileqg.jl:164-659``).

The whole solve is one jit-compiled pure function: rollouts are
``lax.scan``, model approximation is a time-``vmap`` of AD, the Riccati
passes are reverse scans with a bounded μ-restart ``while_loop``
(``ops/riccati.py``), and the two data-dependent loops — backtracking line
search and the outer iLEQG iteration — are ``lax.while_loop``s with explicit
carries (SURVEY.md §7 principle 5).  Because every loop is a lax primitive,
``jax.vmap`` of :func:`solve` yields a *bank* of simultaneous solves with
per-lane iteration masking — this is what replaces the reference's
process-level fan-out of one solve per θ-sample
(``cross_entropy_bilevel_optimization.jl:180-192``).

Exceptions become flags: the reference's "neurotic breakdown" asserts and the
bilevel catch-to-Inf (``cross_entropy_bilevel_optimization.jl:161-166``)
surface here as ``result.failed`` with ``result.value == +Inf``.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.config import ILEQGConfig
from ratilqr_tpu.ops.approx import approximate_folded, approximate_model
from ratilqr_tpu.ops.riccati import (dp_evaluate, dp_evaluate_folded,
                                     dp_optimize)
from ratilqr_tpu.ops.rollout import (rollout_feedback,
                                     rollout_feedback_with_jac,
                                     rollout_open_loop,
                                     rollout_open_loop_with_jac)
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.utils.numerics import isapprox, max_control_deviation

Array = jnp.ndarray


class ILEQGResult(NamedTuple):
    """Return value of :func:`solve` — the reference's
    ``(x_array, l_array, L_array, value, ϵ_history)`` tuple
    (``ileqg.jl:655-658``) plus explicit failure/diagnostic fields."""
    x: Array             # (N+1, n) nominal state trajectory
    l: Array             # (N, m)   nominal control schedule
    L: Array             # (N, m, n) feedback gains: π_k(x) = L_k(x−x_k)+l_k
    value: Array         # ()       optimal cost-to-go; +Inf if failed
    eps_history: Array   # (cap, 2) saturating buffer of (ε, Δvalue) per LS
                         # trial: first cap−1 trials plus the most recent
                         # one; eps_count counts ALL trials (may exceed cap)
    eps_count: Array     # ()       total line-search trials recorded
    iterations: Array    # ()       iLEQG iterations executed
    d_final: Array       # ()       final max ‖Δl_t‖₂ error norm
    mu_final: Array      # ()       final regularization μ
    failed: Array        # ()       neurotic breakdown / budget exhaustion


class _State(NamedTuple):
    """Outer-iteration carry — deliberately SLIM.

    Under ``vmap`` the outer ``lax.while_loop`` where-selects every carry
    leaf on every round (loop mask + step commit + line-search commit ≈ 3
    full sweeps), so carried bytes are the dominant HBM tax at large bank
    sizes (the B≥131k throughput regression, BASELINE.md).  The nominal
    trajectory ``x`` and the Jacobian caches ``A``/``B`` are therefore NOT
    carried: the committed closed-loop trajectory satisfies
    ``x_{t+1} = f(x_t, l_t)`` with the committed ``l`` (the realized
    controls), so one open-loop rollout from ``(x0, l)`` at the top of each
    step re-derives them bit-identically — same inputs through the same
    ``f``/``f_jac`` ops.  ``L`` stays carried: the returned gains are the
    ones the last ``step!`` computed from its PRE-line-search trajectory
    (``ileqg.jl:604-609``), which cannot be recomputed from the post-search
    state.  Dropping (x, A, B) cuts the swept state from ~2,600 to ~800
    floats/lane (unicycle T=100) for the cost of one extra rollout+jac per
    round — the select sweeps it replaces were measured ~3x dearer
    (docs/performance.md "carry-select trap").
    """
    l: Array
    L: Array
    value: Array
    mu: Array
    delta: Array
    d_current: Array
    eps_init_cur: Array
    iterations: Array
    eps_hist: Array
    eps_count: Array
    done: Array
    failed: Array


def _push_hist(hist: Array, count: Array, valid: Array, eps: Array,
               dval: Array) -> Tuple[Array, Array]:
    """Append (ε, Δvalue) to the saturating history buffer when ``valid``.

    Once full, later entries overwrite the last slot (first ``cap−1``
    trials + latest are retained) while the counter keeps the true total —
    a bounded-memory stand-in for the reference's unbounded ``ϵ_history``
    push (``ileqg.jl:537``).

    ``cap == 0`` disables recording entirely (the counter still counts):
    the buffer is then a zero-size array that costs nothing to thread
    through the search loop — the right setting for large solver banks,
    where nobody reads per-lane trial diagnostics.
    """
    cap = hist.shape[0]
    if cap == 0:
        return hist, count + valid.astype(count.dtype)
    idx = jnp.minimum(count, cap - 1)
    entry = jnp.stack([eps, dval]).astype(hist.dtype)
    new = hist.at[idx].set(jnp.where(valid, entry, hist[idx]))
    return new, count + valid.astype(count.dtype)


def _line_search(problem: RiskSensitiveProblem, config: ILEQGConfig,
                 state: _State, x_ref: Array, dl: Array, theta: Array):
    """Backtracking line search (``ileqg.jl:494-592``).

    Candidate ``l + ε·dl`` is rolled out closed-loop under the frozen gains
    around the nominal ``x_ref``, fully re-approximated, and evaluated with
    the policy-evaluating DP; a DP failure (non-PSD M, the reference's
    catch at ``ileqg.jl:529-535``) shrinks ε and retries without recording
    history.  Acceptance rule: ``value_new ≈ value_current || value_new <
    value_current`` (``ileqg.jl:538``); below ``eps_min`` the candidate is
    accepted unconditionally (``ileqg.jl:558-575``).
    """
    dtype = state.value.dtype
    lam = jnp.asarray(config.lam, dtype)

    def eval_candidate(eps):
        """Roll out, re-approximate and DP-evaluate one candidate l+ε·dl.

        Returns only scalars — the candidate trajectory is deliberately NOT
        threaded through the search loop.  Under ``vmap`` a ``while_loop``
        masks done lanes by selecting every carry leaf each round; carrying
        the ``(T, ·)`` trajectory/Jacobian stacks made those selects the
        dominant cost of the whole solve (profiled: ~19 ms of a 25 ms
        iteration was carry select/copy traffic at B=2048).  The accepted
        candidate is recomputed once after the loop — bit-identical, same
        inputs through the same ops.

        The evaluation runs on the closed-loop-FOLDED path
        (``approximate_folded`` + ``dp_evaluate_folded``): one fused scan
        emits the 22-float/step folded stack instead of materializing the
        (x, u, A, B) rollout stacks plus the 40-float Approximation — the
        LS trial was the largest slice of warm-solve device time and is
        HBM-round-trip-bound at headline bank sizes (docs/performance.md
        "Warm re-plan device budget").  Semantics: algebraically identical
        to the unfolded evaluating DP with dl = 0 (``ileqg.jl:412-465``;
        identity in ``FoldedApprox``).
        """
        l_cand = state.l + eps * dl
        if config.fused_candidate_eval:
            # Whole trial as one Mosaic program on TPU banks (rollout +
            # quadratize + fold + folded DP — the intermediate stacks
            # live in VMEM, not HBM); XLA folded path off-TPU.
            from ratilqr_tpu.ops.candidate_pallas import candidate_value
            value_new, fail = candidate_value(problem, x_ref, l_cand,
                                              state.L, state.mu, theta,
                                              unroll=config.scan_unroll)
        elif config.fold_candidate_eval:
            folded = approximate_folded(problem, x_ref, l_cand, state.L,
                                        state.mu,
                                        unroll=config.scan_unroll)
            value_new, fail = dp_evaluate_folded(folded, theta=theta,
                                                 unroll=config.scan_unroll)
        else:
            x_new, u_new, A_new, B_new = rollout_feedback_with_jac(
                problem, x_ref, l_cand, state.L,
                unroll=config.scan_unroll)
            approx_new = approximate_model(problem, u_new, x_new, A_new,
                                           B_new)
            value_new, fail = dp_evaluate(approx_new, state.L, None,
                                          theta=theta, mu=state.mu,
                                          unroll=config.scan_unroll,
                                          slim=True)
        return value_new, ~fail

    def trial(carry):
        (eps, count, accepted, eps_acc, value_c, hist, hist_n) = carry
        value_new, evaluated = eval_candidate(eps)

        hist, hist_n = _push_hist(hist, hist_n, evaluated, eps,
                                  value_new - state.value)

        accept = evaluated & (isapprox(value_new, state.value)
                              | (value_new < state.value))
        if config.verbose:
            jax.debug.print(
                "----line search eps={e:.6f} value={v:.4f} accept={a}",
                e=eps, v=value_new, a=accept)
        eps_next = jnp.where(accept, eps, eps * lam)
        # ε_min reached → accept the already-evaluated candidate anyway.
        forced = evaluated & ~accept & (eps_next < config.eps_min)
        take = accept | forced

        sel = lambda new, old: jnp.where(take, new, old)
        return (eps_next, count + 1, accepted | take, sel(eps, eps_acc),
                sel(value_new, value_c), hist, hist_n)

    def chunk_round(carry):
        """Evaluate ``ls_chunk`` ladder candidates ε·λ^j in ONE batched
        pass and commit the first acceptable one.

        Trial-for-trial identical to the sequential ``trial`` loop: each
        candidate's accept/forced decision depends only on the (frozen)
        pre-search state, so evaluating the ladder in parallel and
        selecting the first take reproduces the sequential outcome —
        including ε_history entries, trial counts, and the post-search ε
        (candidates past the first take are discarded as if never run).
        """
        (eps0, count, accepted, eps_acc, value_c, hist, hist_n) = carry
        c = config.ls_chunk
        ladder = eps0 * lam ** jnp.arange(c, dtype=dtype)
        values, evaluated = jax.vmap(eval_candidate)(ladder)

        in_budget = (count + jnp.arange(c, dtype=count.dtype)
                     < config.ls_max_trials)
        accept = evaluated & (isapprox(values, state.value)
                              | (values < state.value))
        forced = evaluated & ~accept & (ladder * lam < config.eps_min)
        take = (accept | forced) & in_budget
        has_take = jnp.any(take)
        first_take = jnp.argmax(take)          # first True; 0 if none
        n_budget = jnp.minimum(
            jnp.asarray(c, count.dtype),
            jnp.asarray(config.ls_max_trials, count.dtype) - count)
        n_exec = jnp.where(has_take,
                           first_take.astype(count.dtype) + 1, n_budget)

        for j in range(c):  # static unroll: ordered history pushes
            valid = evaluated[j] & (j < n_exec)
            hist, hist_n = _push_hist(hist, hist_n, valid, ladder[j],
                                      values[j] - state.value)

        pick = lambda arr: jnp.take(arr, first_take, axis=0)
        sel = lambda new, old: jnp.where(has_take, new, old)
        eps_next = jnp.where(
            has_take,
            jnp.where(pick(accept), pick(ladder), pick(ladder) * lam),
            eps0 * lam ** n_exec.astype(dtype))
        return (eps_next, count + n_exec, accepted | has_take,
                sel(pick(ladder), eps_acc), sel(pick(values), value_c),
                hist, hist_n)

    def cond(carry):
        eps, count, accepted = carry[0], carry[1], carry[2]
        return ~accepted & (count < config.ls_max_trials)

    init = (state.eps_init_cur, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.zeros((), dtype), state.value,
            state.eps_hist, state.eps_count)
    body = trial if config.ls_chunk == 1 else chunk_round
    (eps, count, accepted, eps_acc, value_c, hist,
     hist_n) = lax.while_loop(cond, body, init)

    # Re-materialize the accepted candidate's realized controls: identical
    # inputs through the identical ops as its in-loop evaluation, so this
    # is the same result without ever threading (T, ·) stacks through the
    # loop.  Only ``u_n`` is committed — the trajectory and Jacobians are
    # re-derived from it at the top of the next step (slim carry, see
    # ``_State``), so the plain (jac-free) feedback rollout suffices.
    # For lanes that accepted nothing (failed), eps_acc is 0 and the
    # selects below keep the pre-search state.
    l_acc = state.l + eps_acc * dl
    _, u_n = rollout_feedback(problem, x_ref, l_acc, state.L)
    d_n = max_control_deviation(state.l, u_n)
    sel = lambda new, old: jnp.where(accepted, new, old)

    # Adaptive ε_init warm start (ileqg.jl:582-591).
    if config.adaptive_eps_init:
        eps_init_init = jnp.asarray(config.eps_init, dtype)
        grown = jnp.minimum(eps_init_init, eps / lam)
        # Bring ε back above ε_min (the reference's `while ϵ < ϵ_min` loop).
        # Guard e > 0: enough f32 shrink rounds underflow ε to exactly 0,
        # where `0/λ == 0` would spin this loop forever (and one such lane
        # hangs a whole vmapped bank); restore those lanes to ε_min
        # directly — for every non-zero ε the result is bit-identical to
        # the unguarded loop.
        restored = lax.while_loop(lambda e: (e < config.eps_min) & (e > 0),
                                  lambda e: e / lam, eps)
        restored = jnp.maximum(restored, jnp.asarray(config.eps_min, dtype))
        eps_init_next = jnp.where(count == 1, grown, restored)
    else:
        eps_init_next = state.eps_init_cur

    return state._replace(
        l=sel(u_n, state.l), value=value_c,
        d_current=sel(d_n, state.d_current),
        eps_hist=hist, eps_count=hist_n, eps_init_cur=eps_init_next,
        failed=state.failed | ~accepted)


def _step(problem: RiskSensitiveProblem, config: ILEQGConfig, state: _State,
          theta: Array, x0: Array) -> _State:
    """One iLEQG iteration: approximate → optimizing DP → line search
    (``ileqg.jl:598-613``).

    The nominal trajectory and Jacobian caches are re-derived from the
    committed controls by one open-loop rollout (bit-identical to the
    line search's closed-loop commit — see ``_State``), and the
    re-approximation duplicates the accepted line-search candidate's AD
    pass bit-for-bit; carrying either stack through the while-loop instead
    was measured SLOWER on the TPU runtime (the ~50 MB Approximation
    pytree crossing two nested while-loop carry boundaries every round
    costs more than recomputing it: warm bank throughput halved,
    30k→15k solves/s).  Keep the recomputes.
    """
    if config.fused_step_optimize:
        # Whole step-side pipeline as one Mosaic program on TPU banks
        # (rollout + quadratize + optimizing DP with the intermediate
        # stacks in VMEM — ops/step_pallas.py); XLA composition (the
        # branch below, verbatim) off-TPU or without a tile model.
        from ratilqr_tpu.ops.step_pallas import step_optimize
        x, _, L_new, dl, mu, delta, fail_opt = step_optimize(
            problem, x0, state.l, theta=theta, mu=state.mu,
            delta=state.delta, mu_min=config.mu_min,
            delta_0=config.delta_0, unroll=config.scan_unroll)
    else:
        x, A, B = rollout_open_loop_with_jac(problem, x0, state.l,
                                             unroll=config.scan_unroll)
        approx = approximate_model(problem, state.l, x, A, B)
        _, L_new, dl, mu, delta, fail_opt = dp_optimize(
            approx, theta=theta, mu=state.mu, delta=state.delta,
            mu_min=config.mu_min, delta_0=config.delta_0,
            unroll=config.scan_unroll, slim=True)
    state = state._replace(L=L_new, mu=mu, delta=delta,
                           iterations=state.iterations + 1,
                           failed=state.failed | fail_opt)
    ls_state = _line_search(problem, config, state, x, dl, theta)
    # If the optimizing DP already failed, the line search result is garbage;
    # keep the failure latched (value forced to Inf at the end of solve()).
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(state.failed, a, b), state, ls_state
    )._replace(failed=state.failed | ls_state.failed)


def _initialize(problem: RiskSensitiveProblem, config: ILEQGConfig,
                x0: Array, u_init: Array, theta: Array) -> _State:
    """``initialize!`` (``ileqg.jl:214-236``): μ←0, Δ←Δ₀, nominal rollout,
    zero gains, initial value from one policy-evaluating DP pass."""
    dtype = x0.dtype
    N = u_init.shape[0]
    n, m = x0.shape[0], u_init.shape[1]
    L = jnp.zeros((N, m, n), dtype)
    if config.fused_candidate_eval:
        # Same fused kernel as the line-search trials: with L = 0 the
        # closed-loop candidate degenerates to the open-loop u_init
        # evaluation this initialize! computes (x̄ only enters through
        # L(x − x̄), and x starts at x̄_0 = x0).
        from ratilqr_tpu.ops.candidate_pallas import candidate_value
        x_ref0 = jnp.broadcast_to(x0, (N + 1, n))
        value0, fail = candidate_value(problem, x_ref0, u_init, L,
                                       jnp.zeros((), dtype), theta,
                                       unroll=config.scan_unroll)
    elif config.fold_candidate_eval:
        # L = 0 evaluation on the folded fast path (the fold degenerates
        # to the raw (q, q_vec, Q, A) stack — no control blocks
        # materialize or stream into the kernel).
        folded = approximate_folded(problem, x0, u_init,
                                    unroll=config.scan_unroll)
        value0, fail = dp_evaluate_folded(folded, theta=theta,
                                          unroll=config.scan_unroll)
    else:
        x, A, B = rollout_open_loop_with_jac(problem, x0, u_init,
                                             unroll=config.scan_unroll)
        approx = approximate_model(problem, u_init, x, A, B)
        value0, fail = dp_evaluate(approx, L, None, theta=theta,
                                   mu=jnp.zeros((), dtype),
                                   unroll=config.scan_unroll, slim=True)
    # (x, A, B) are not carried — _step re-derives them bit-identically
    # from (x0, l); see the _State docstring.
    return _State(
        l=u_init, L=L, value=value0,
        mu=jnp.zeros((), dtype), delta=jnp.asarray(config.delta_0, dtype),
        d_current=jnp.asarray(jnp.inf, dtype),
        eps_init_cur=jnp.asarray(config.eps_init, dtype),
        iterations=jnp.zeros((), jnp.int32),
        eps_hist=jnp.zeros((config.eps_history_cap, 2), dtype),
        eps_count=jnp.zeros((), jnp.int32),
        done=fail, failed=fail)


@partial(jax.jit, static_argnums=(0, 1))
def solve(problem: RiskSensitiveProblem, config: ILEQGConfig, x0: Array,
          u_init: Array, theta: Array) -> ILEQGResult:
    """Solve iLQG (``theta == 0``) or iLEQG (``theta > 0``).

    Counterpart of ``solve!`` (``ileqg.jl:635-659``): initialize, then
    iterate ``step!`` until ``d_current < d ∧ μ ≤ μ_min`` or ``iter_max``
    (``ileqg.jl:642-653``) — here a ``lax.while_loop`` in do-while form (the
    reference always executes at least one step).

    ``problem`` and ``config`` are static; re-jitting happens per problem,
    and the function is ``vmap``-able over ``(x0, u_init, theta)`` for
    solver banks.
    """
    theta = jnp.asarray(theta, x0.dtype)
    state = _initialize(problem, config, x0, u_init, theta)

    def cond(s: _State):
        return ~s.done

    def body(s: _State):
        s = _step(problem, config, s, theta, x0)
        converged = (s.d_current < config.d_tol) & (s.mu <= config.mu_min)
        done = converged | (s.iterations >= config.iter_max) | s.failed
        if config.verbose:
            jax.debug.print(
                "--iLEQG iter {i}: value={v:.4f} d={d:.5f} mu={m:.2e} "
                "converged={c}", i=s.iterations, v=s.value, d=s.d_current,
                m=s.mu, c=converged)
        return s._replace(done=done)

    state = lax.while_loop(cond, body, state)
    value = jnp.where(state.failed, jnp.asarray(jnp.inf, x0.dtype),
                      state.value)
    # Re-materialize the nominal trajectory from the committed controls
    # (bit-identical: x_{t+1} = f(x_t, l_t) — see _State); the slim carry
    # never threads it through the loop.
    x_final = rollout_open_loop(problem, x0, state.l)
    return ILEQGResult(
        x=x_final, l=state.l, L=state.L, value=value,
        eps_history=state.eps_hist, eps_count=state.eps_count,
        iterations=state.iterations, d_final=state.d_current,
        mu_final=state.mu, failed=state.failed)


def solve_value(problem: RiskSensitiveProblem, config: ILEQGConfig,
                x0: Array, u_init: Array, theta: Array) -> Array:
    """Value-only convenience wrapper (the bilevel solvers' worker unit,
    ``cross_entropy_bilevel_optimization.jl:144-167``)."""
    return solve(problem, config, x0, u_init, theta).value


def solve_via_bank(problem: RiskSensitiveProblem, config: ILEQGConfig,
                   x0: Array, u_init: Array, theta) -> ILEQGResult:
    """Single solve routed through a 1-lane vmapped bank.

    Semantically identical to :func:`solve`, but the vmap fires the Riccati
    bank dispatch (``ops/riccati.py``), so on TPU the DP passes take the
    fused Pallas kernel instead of the per-step scan — measured 99 ms vs
    33 ms for one warm unicycle T=30 solve (round 3).  This is the right
    call for every *single-θ* solve inside a latency-sensitive path: the
    bilevel solvers' final re-solves and the host NM per-vertex worker.
    Works both inside jit (the bilevel jit programs) and at the top level.
    """
    theta = jnp.asarray(theta, x0.dtype)
    res = jax.vmap(lambda th: solve(problem, config, x0, u_init, th))(
        theta[None])
    return jax.tree_util.tree_map(lambda a: a[0], res)


# Public aliases mirroring the reference's exported solver internals
# (src/RATiLQR.jl:28-41 exports initialize!, step!, line_search! alongside
# solve!): the underscore-prefixed functions are the implementation names.
ILEQGState = _State
initialize = _initialize
step = _step
line_search = _line_search




@lru_cache(maxsize=128)
def make_batched_solver(problem: RiskSensitiveProblem, config: ILEQGConfig):
    """Build a jitted θ-bank solver: ``(x0, u_init, theta_batch) ->
    ILEQGResult`` batched over the leading axis of ``theta_batch``.

    This is the TPU-native replacement for the reference's per-θ process
    fan-out (``cross_entropy_bilevel_optimization.jl:180-192``): all lanes
    run the full iLEQG solve simultaneously on one chip, with per-lane
    while-loop masking from vmap's batching rules.

    Cached per ``(problem, config)`` so repeated MPC re-plans reuse the
    compiled executable instead of building a fresh jit wrapper.
    """
    batched = jax.vmap(lambda x0, u, th: solve(problem, config, x0, u, th),
                       in_axes=(None, None, 0))
    return jax.jit(batched)
