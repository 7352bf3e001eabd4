"""Profiling & timing utilities.

The reference has no instrumentation at all (SURVEY.md §5: "Tracing /
profiling: none" — the only introspection artifact is ``ϵ_history``).  This
module is the greenfield observability layer: steady-state timing helpers
that respect device asynchrony, and a thin wrapper over the JAX profiler
for TPU trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import numpy as np


def sync(tree) -> float:
    """Force completion of a computation by FETCHING a value to the host.

    ``jax.block_until_ready`` is a silent no-op on some experimental
    backends (measured on the tunneled axon TPU: block returns in 0.2 ms
    while the computation runs for seconds) — the only reliable barrier is
    a device→host transfer.  Fetches one element of the first array leaf
    and returns it.
    """
    leaf = next(l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "ravel"))
    return float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def time_fn(fn: Callable, *args, warmup: int = 1, reps: int = 5,
            **kwargs) -> Dict[str, float]:
    """Steady-state wall-clock timing of a (jitted) function.

    Each rep dispatches the function and then *fetches* an output element —
    device execution is async and ``block_until_ready`` cannot be trusted
    on the tunneled backend (see :func:`sync`).  Returns seconds:
    ``{"best", "median", "mean", "compile"}`` where ``compile`` is the
    first (warmup) call including compilation.
    """
    t0 = time.perf_counter()
    sync(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        sync(fn(*args, **kwargs))
    times: List[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"best": min(times), "median": float(np.median(times)),
            "mean": float(np.mean(times)), "compile": compile_s}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace (viewable in XProf/TensorBoard)::

        with profiling.trace("/tmp/trace"):
            bank(x0, u0, thetas).value.block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating named-phase wall timer for host-orchestrated loops
    (CE generations, NM vertex evaluations, MPC re-plans)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_s": self.totals[k] / self.counts[k]}
                for k in self.totals}
