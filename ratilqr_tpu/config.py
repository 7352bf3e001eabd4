"""Solver configuration dataclasses.

The reference duplicates every iLEQG hyperparameter into each outer solver
struct (``cross_entropy_bilevel_optimization.jl:72-81``,
``nelder_mead_bilevel_optimization.jl:73-82``).  Here configs *compose*: the
outer solvers embed an ``ILEQGConfig`` (SURVEY.md §5 config note).

All configs are frozen/hashable so they can be passed as static jit
arguments; defaults match the reference's validated constructor defaults
(``ileqg.jl:191-208``, ``cross_entropy_bilevel_optimization.jl:100-127``,
``nelder_mead_bilevel_optimization.jl:102-128``, ``pets.jl:52-68``).
"""
from __future__ import annotations

import dataclasses


def _check(cond: bool, msg: str):
    if not cond:
        raise ValueError(msg)


@dataclasses.dataclass(frozen=True)
class ILEQGConfig:
    """iLQG/iLEQG solver parameters (``ileqg.jl:191-208``).

    Attributes:
      mu_min: minimum Hessian regularization μ (> 0).
      delta_0: minimum multiplicative modification factor Δ₀ (> 0) for μ.
      lam: line-search step shrink factor λ ∈ (0, 1).
      d_tol: convergence threshold on max ‖Δl_t‖₂ (> 0).
      iter_max: maximum iLEQG iterations.
      eps_init: initial line-search step ε ∈ (ε_min, 1].
      adaptive_eps_init: warm-start ε_init from the previous iteration
        (``ileqg.jl:582-591``).
      eps_min: minimum line-search step; reaching it accepts the candidate
        unconditionally (``ileqg.jl:558-575``).
      ls_max_trials: hard cap on line-search trials per iteration.  The
        reference's DP-failure retry path (``ileqg.jl:529-535``) has no
        bound; lanes exhausting this cap are declared failed (cost = Inf).
      eps_history_cap: static length of the (ε, Δvalue) diagnostics
        buffer replacing the reference's growing ``ϵ_history``
        (``ileqg.jl:187,537``).  Saturating, not a ring: the first
        ``cap−1`` trials are retained and the last slot holds the most
        recent trial; ``eps_count`` keeps the true total.  ``0`` disables
        recording (``eps_count`` still counts) — recommended for large
        solver banks where per-lane trial diagnostics are never read.
      verbose: emit per-iteration progress from inside the jitted solve
        via ``jax.debug.print`` (counterpart of the reference's
        verbose-gated println traces, SURVEY.md §5); static, so disabled
        verbosity costs nothing.
      scan_unroll: unroll factor for the Riccati/rollout time scans.  On
        the TPU runtime each scan step pays fixed per-op dispatch overhead;
        unrolling lets XLA fuse across steps (pure perf knob — results are
        bit-identical).  Default 1; the TPU benchmark configs use ~10
        (4.7x measured).  Large unrolls can exhaust the XLA:CPU LLVM
        compiler on big suites, so keep 1 for CPU runs.
      ls_chunk: number of line-search ε-candidates evaluated *in one
        batched pass* per backtracking round (the candidates are the
        geometric ladder ε, ελ, ελ², …).  The first acceptable candidate
        is committed, so the fixed point is identical to the sequential
        trial-at-a-time loop (chunk=1, the default) — trial-for-trial
        including ε_history.  Pure perf knob: under a vmapped bank the
        sequential loop serializes max-trials-over-lanes full
        rollout+approx+DP rounds per iteration; chunking evaluates the
        ladder as one (B·chunk)-lane batch.  TPU benchmark configs use
        ~8; keep 1 on CPU (compile cost, no latency win).
      fold_candidate_eval: evaluate line-search candidates (and the
        ``initialize!`` value) through the closed-loop-FOLDED stack
        (``ops/approx.approximate_folded`` + the folded Riccati kernel):
        22 instead of 46 floats/step/lane cross the XLA↔kernel boundary.
        Semantically identical (algebraic identity in ``FoldedApprox``;
        pinned by tests), and the *isolated* candidate evaluation
        measures 27% faster at B=65,536 — but the FULL warm solve
        measures 18% SLOWER in an interleaved A/B (478k → 393k solves/s)
        with ~30× the compile time: splitting the candidate evaluation
        into rollout → separate fold stage → second kernel variant costs
        XLA the cross-stage fusions that the unfolded composition gets
        for free.  Kept as an opt-in (default False) because the
        trade-off is shape-dependent; measured record in
        docs/performance.md "Warm re-plan device budget".
      fused_candidate_eval: evaluate line-search candidates as ONE fused
        Mosaic program (rollout + quadratize + fold + folded DP,
        ``ops/candidate_pallas.py``) when the problem carries a
        ``tile_model`` and the folded stack fits VMEM; the rollout/
        approximation stacks never touch HBM.  Semantically identical to
        the folded XLA path (pinned by tests/test_candidate_fused.py).
        Off-TPU, or without a tile model, the flag falls back to the
        folded XLA composition per candidate.
      fused_step_optimize: run the step-side pipeline — open-loop rollout
        + quadratization + the policy-OPTIMIZING Riccati pass — as ONE
        fused Mosaic program (``ops/step_pallas.py``) under the same
        μ-restart harness.  Motivated by the round-5 iteration audit
        (docs/performance.md "Where the warm residual actually goes"):
        ~10 ms of every warm iteration at B=65,536 was the rollout/
        approximation stacks crossing HBM into the DP custom call.
        Semantically identical to the default composition (pinned by
        tests/test_step_fused.py); same tile-model/VMEM/TPU gating and
        XLA fallback as ``fused_candidate_eval``.
    """
    mu_min: float = 1e-6
    delta_0: float = 2.0
    lam: float = 0.5
    d_tol: float = 1e-2
    iter_max: int = 100
    eps_init: float = 1.0
    adaptive_eps_init: bool = False
    eps_min: float = 1e-6
    ls_max_trials: int = 64
    eps_history_cap: int = 256
    scan_unroll: int = 1
    ls_chunk: int = 1
    fold_candidate_eval: bool = False
    fused_candidate_eval: bool = False
    fused_step_optimize: bool = False
    verbose: bool = False

    def __post_init__(self):
        _check(self.ls_chunk >= 1, "ls_chunk must be >= 1")
        _check(self.eps_history_cap >= 0, "eps_history_cap must be >= 0")
        _check(0 < self.lam < 1, "lam must be in (0, 1)")
        _check(self.d_tol > 0, "d_tol > 0 is necessary")
        _check(self.mu_min > 0, "mu_min > 0 is necessary")
        _check(self.delta_0 > 0, "delta_0 > 0 is necessary")
        _check(0 < self.eps_init <= 1, "eps_init must be in (0, 1]")
        _check(self.eps_init > self.eps_min, "eps_init > eps_min is necessary")
        _check(0 < self.eps_min < 1, "eps_min must be in (0, 1)")


@dataclasses.dataclass(frozen=True)
class CrossEntropyConfig:
    """RAT iLQR outer Cross-Entropy parameters
    (``cross_entropy_bilevel_optimization.jl:84-127``).

    ``mu_init``/``sigma_init`` live in the *state* (they adapt across MPC
    re-plans, ``cross_entropy_bilevel_optimization.jl:66-68``), not here;
    only their initial values are configured.

    ``verbose`` emits the per-generation progress traces (the reference's
    verbose-gated prints, ``cross_entropy_bilevel_optimization.jl:260-309``)
    — from the host path via ``print`` and from the fully-jitted path via
    ``jax.debug.print``; static, so disabled verbosity costs nothing.
    (Caveat: runtimes without host-callback support — e.g. the tunneled
    axon dev backend — reject ``jax.debug.print`` programs; verbose jit
    solves require CPU or a standard TPU runtime.)
    """
    num_samples: int = 10
    num_elite: int = 3
    iter_max: int = 5
    lam: float = 0.5
    use_theta_max: bool = False
    mu_init: float = 1.0
    sigma_init: float = 2.0
    verbose: bool = False
    ileqg: ILEQGConfig = ILEQGConfig()

    def __post_init__(self):
        _check(0 < self.lam < 1, "lam must be in (0, 1)")
        _check(self.num_elite <= self.num_samples,
               "num_elite must be <= num_samples")


@dataclasses.dataclass(frozen=True)
class NelderMeadConfig:
    """RAT iLQR++ outer Nelder-Mead parameters
    (``nelder_mead_bilevel_optimization.jl:85-128``).

    ``verbose`` emits the per-iteration simplex traces (the reference's
    verbose-gated prints, ``nelder_mead_bilevel_optimization.jl:181-249``)
    — host path via ``print``, fully-jitted path via ``jax.debug.print``;
    static, so disabled verbosity costs nothing.

    ``refresh_carried_costs`` opts out of the reference's cross-solve
    c-persistence quirk: ``solve!`` re-computes the simplex vertex costs
    only under ``isnothing`` (``nelder_mead_bilevel_optimization.jl:283,
    294``), so on every warm MPC re-plan a stale ``c_low`` from the
    PREVIOUS state sits on the simplex.  Fresh costs at the new state can
    never close the gap to it, the vertex-cost-stdev convergence test
    (ref :306-317) never fires, and the solver burns all ``iter_max``
    iterations per re-plan (measured: 100/100 on every warm step,
    docs/performance.md "RAT iLQR++ re-plan latency").  With ``True`` the
    carried vertex costs are discarded and re-evaluated at the incoming
    ``(x0, u_init)`` via the standard feasibility bootstrap (the simplex θ
    vertices are already reset to the carried inits by ``initialize!``,
    ref :164-168), restoring the convergence test — warm re-plans converge
    in single-digit iterations and RAT iLQR++ regains its "faster than RAT
    iLQR" headline property (reference ``README.md:15``).  Default
    ``False`` for decision-for-decision reference parity.

    ``speculation_depth`` (jitted path only) evaluates that many NM
    iterations' candidate trees in ONE iLEQG bank per loop round.  An NM
    step can only ever query 6 θs computable up front from the sorted
    simplex; chaining the hypotheses over the 6 possible new vertices × 2
    sort orders gives 6 / 78 / 942 lanes at depth 1 / 2 / 3 — and on TPU
    the Pallas Riccati bank pads to a 1024-lane tile regardless, so a
    942-lane bank costs the same wall-clock as 6 lanes while collapsing 3
    *sequentially dependent* dispatch rounds into 1.  Decision replay is
    exact (same formulas, same values), so results are identical at any
    depth; depth > 3 would exceed one lane tile and is rejected.  Pure
    latency knob for the single-dispatch MPC path; keep 1 on CPU (the
    speculative lanes are real compute there).
    """
    alpha: float = 1.0    # reflection
    beta: float = 2.0     # expansion
    gamma: float = 0.5    # contraction
    eps: float = 1e-2     # convergence on vertex-cost stdev
    lam: float = 0.5      # feasibility-bootstrap shrink factor
    iter_max: int = 100
    theta_high_init: float = 3.0
    theta_low_init: float = 1e-8
    refresh_carried_costs: bool = False
    speculation_depth: int = 1
    verbose: bool = False
    ileqg: ILEQGConfig = ILEQGConfig()

    def __post_init__(self):
        _check(1 <= self.speculation_depth <= 3,
               "speculation_depth must be in {1, 2, 3} (depth 3 already "
               "fills one 1024-lane TPU tile: 6 + 72 + 864 = 942 lanes)")


@dataclasses.dataclass(frozen=True)
class PETSConfig:
    """PETS (CEM-over-control-sequences) parameters (``pets.jl:35-68``).

    ``scan_unroll`` fuses that many rollout time steps per scan round,
    amortizing the scan's per-step carry hand-off across the tiny
    elementwise+PRNG step kernels — measured 183 → 154 µs per generation
    at the 16k-rollout config, lifting the grid from 54% to 64% of the
    VPU compute roofline (docs/performance.md "PETS roofline").  Pure
    perf knob (results bit-identical).  TPU benchmark configs use ~10;
    keep 1 on CPU.
    """
    num_control_samples: int = 10
    num_trajectory_samples: int = 10
    num_elite: int = 3
    iter_max: int = 5
    smoothing_factor: float = 0.1
    scan_unroll: int = 1

    def __post_init__(self):
        _check(0.0 <= self.smoothing_factor <= 1.0,
               "smoothing_factor must be in [0, 1]")
        _check(self.num_elite <= self.num_control_samples,
               "num_elite must be <= num_control_samples")
