"""Test configuration.

Runs the suite on CPU with 8 virtual XLA devices — the analogue of the
reference harness spawning one extra Julia worker (``test/runtests.jl:11-13``)
— so multi-device sharding tests run anywhere (SURVEY.md §4 implication (c)).
x64 is enabled because the reference is Float64 throughout; the library
itself is dtype-polymorphic (bench runs f32 on TPU).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hook re-forces jax_platforms="axon,cpu" in every
# python process, silently routing "CPU" tests through the TPU tunnel (with
# tunnel round-trips per eager op).  Override it back to genuine CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do NOT enable the persistent compilation cache here — reloading
# cached XLA:CPU AOT executables segfaults on this VM (machine-feature
# mismatch: "+prefer-no-scatter is not supported on the host machine").
# The cache is only used for the slow tunneled TPU compiles (bench.py).

import pytest  # noqa: E402

# --- fast/slow test tiers (VERDICT r2 item 5) ------------------------------
# The full suite compiles hundreds of XLA programs and takes ~25 min on CPU;
# CI runs the fast tier (-m "not slow") on pull requests and the full suite
# on pushes to main.  Slow markers are centralized here (measured from
# `--durations`, cutoff ~13 s per test) instead of scattered across files.

SLOW_MODULES = {
    "test_parity_fuzz",              # random-problem oracle/NM fuzzing
    "test_nm_jit_fuzz",              # NM-jit decision-replay fuzz (VERDICT r4 #6)
    "test_riccati_parallel",         # associative-scan experimental backend
    "test_distributed_multiprocess", # spawns a second jax.distributed proc
    "test_multihost_bench",          # subprocess runs of benchmarks/multihost.py
    "test_oracle_bilevel",           # eager outer-loop oracles, many solves
    "test_golden",                   # frozen-file replay of the eager oracles
}
SLOW_TESTS = {
    "test_models_dims.py::test_pallas_kernel_at_dimension[quadrotor]",
    "test_models_dims.py::test_solver_stack_at_dimension[quadrotor]",
    "test_parity_oracle.py::test_solver_matches_oracle[unicycle]",
    "test_ratilqr_jit.py::test_fleet_vmap_over_full_solve",
    "test_ratilqr_jit.py::test_jit_kl_zero_matches_ilqg",
    "test_ratilqr_jit.py::test_jit_matches_host_path_same_key",
    "test_ratilqr_jit.py::test_jit_solve_end_to_end",
    "test_mpc_episode.py::test_episode_plan_state_checkpoint_roundtrip",
    "test_mpc_episode.py::test_episode_matches_host_loop_ratilqr_jit",
    "test_mpc_episode.py::test_nm_episode_runs_and_threads_state",
    "test_pallas.py::test_custom_vmap_dispatch_full_solve",
    "test_pallas.py::test_kernel_matches_scan_optimizing",
    "test_bilevel.py::test_nelder_mead_jit_fleet_vmap",
    "test_bilevel.py::test_nelder_mead_jit_warm_start_parity",
    "test_bilevel.py::test_host_path_decodes_jit_nan_state",
    "test_bilevel.py::test_nelder_mead_jit_kl_zero_preserves_missing_c",
    # round-5 re-tier from fresh --durations (VERDICT r4 item 7: the fast
    # tier had crept to ~8 min; these measured 20-90 s each):
    "test_bilevel.py::test_nm_jit_speculation_depth_parity",
    "test_bilevel.py::test_nm_jit_casts_carried_state_dtype",
    "test_bilevel.py::test_nm_jit_refresh_matches_host",
    "test_bilevel.py::test_nelder_mead_jit_traced_nan_c_self_heals",
    "test_pallas.py::test_fold_candidate_eval_solver_equivalence",
    "test_parallel.py::test_sharded_theta_bank_masks_nonfinite_lanes",
    "test_candidate_fused.py::test_fused_flag_full_solve_matches",
    # second re-tier pass (solo fast tier measured 6m12s; these 7-15 s
    # tests have denser siblings that stay fast):
    "test_candidate_fused.py::test_candidate_kernel_matches_folded_xla[unicycle-3-2-False]",
    "test_candidate_fused.py::test_candidate_kernel_matches_folded_xla[unicycle-3-2-True]",
    "test_bilevel.py::test_feasibility_rescaling_shrinks_inits",
    "test_pallas.py::test_kernel_slim_matches_full_evaluating",
    "test_parity_oracle.py::test_adaptive_eps_parity",
    "test_bilevel.py::test_nm_refresh_mode_converges_warm",
    "test_line_search_chunk.py::test_history_cap_zero_disables_recording_only",
    "test_utils.py::test_bank_server_matches_individual_solves",
    "test_failure_paths.py::test_host_nm_bootstrap_budget_terminates",
    "test_line_search_chunk.py::test_chunk_exceeding_trial_budget_respects_cap",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[True-0.0-unicycle]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[True-0.01-unicycle]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[False-0.0-unicycle]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[False-0.01-unicycle]",
    "test_failure_paths.py::test_jit_ce_redraw_budget_sets_flag",
    "test_failure_paths.py::test_jit_nm_bootstrap_budget_terminates",
    "test_docs.py::test_getting_started_blocks_execute",
    "test_parallel.py::test_sharded_theta_bank_matches_unsharded",
    "test_parallel.py::test_sharded_fleet_matches_unsharded",
    "test_bilevel.py::test_verbose_jit_bilevel_solves_compile",
    "test_bilevel.py::test_nelder_mead_jit_matches_host",
    "test_models_dims.py::test_pallas_kernel_at_dimension[cartpole]",
    "test_ratilqr_jit.py::test_kl_zero_returns_reference_theta_range",
    "test_ratilqr_jit.py::test_jit_feasibility_redraw_shrinks_inits",
    "test_ratilqr_jit.py::test_unsolvable_problem_surfaces_final_failure",
    "test_mpc.py::test_info_field_carries_theta_opt",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[True-0.0-toy]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[True-0.01-toy]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[False-0.0-toy]",
    "test_line_search_chunk.py::test_chunked_ladder_matches_sequential[False-0.01-toy]",
    "test_pallas.py::test_kernel_shared_noise_model_matches_batched",
    # round-5 fused step kernel (measured 26 s / 13 s; the unicycle/LQR
    # kernel-vs-XLA and μ-restart tests stay in the fast tier):
    "test_step_fused.py::test_fused_step_flag_full_solve_matches",
    "test_step_fused.py::test_step_kernel_matches_xla[cartpole-4-1]",
    # n=12 fused-kernel interpret runs (~60-90 s each: the unrolled
    # 12x12 closed-form algebra is big to trace/compile on CPU):
    "test_step_fused.py::test_step_kernel_matches_xla[quadrotor-12-4]",
    "test_candidate_fused.py::test_candidate_kernel_matches_folded_xla[quadrotor-12-4-False]",
    "test_candidate_fused.py::test_candidate_kernel_matches_folded_xla[quadrotor-12-4-True]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        short_id = f"{mod}.py::{item.name}"
        if mod in SLOW_MODULES or short_id in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_between_modules():
    """Drop compiled executables after each test module.

    The XLA:CPU JIT accumulates native code for every distinct program the
    suite compiles (hundreds across ~20 modules); past a threshold the
    NEXT large compile dies inside ``backend_compile_and_load``
    (SIGSEGV/SIGABRT — reproducibly the n=12 quadrotor solver graph when
    run after ~60 tests, while the same file passes standalone).  Clearing
    the jit caches between modules keeps resident JITed code bounded; the
    lru-cached solver-bank builders must be cleared first so their
    references don't pin executables.
    """
    yield
    from ratilqr_tpu.ops import candidate_pallas, riccati
    from ratilqr_tpu.solvers import ileqg, ratilqr
    ileqg.make_batched_solver.cache_clear()
    ratilqr.make_cost_fn.cache_clear()
    riccati._make_core.cache_clear()
    candidate_pallas._make_candidate_core.cache_clear()
    jax.clear_caches()
