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
    from ratilqr_tpu.ops import riccati
    from ratilqr_tpu.solvers import ileqg, ratilqr
    ileqg.make_batched_solver.cache_clear()
    ratilqr.make_cost_fn.cache_clear()
    riccati._make_core.cache_clear()
    jax.clear_caches()
