"""Serving-throughput utilities: pipelined dispatch over request streams.

Device execution is asynchronous — a jitted call returns futures
immediately; fetching a value blocks until the computation lands.  On
runtimes with a large per-dispatch latency (the tunneled axon v5e charges
~27 ms per round trip) a serve loop that fetches each result before
dispatching the next wastes that latency once per request.  Keeping
``depth`` dispatches in flight amortizes it: the warm B=16,384 iLEQG bank
measures 525k solves/s at depth 8 vs 320k single-dispatch
(``BENCH_PIPELINE_DEPTH=8 python bench.py``, BASELINE.md).

Use :func:`pipelined_map` for streams of independent requests (distinct
MPC fleets, parameter sweeps, evaluation banks).  Do NOT use it inside a
single closed-loop MPC chain — each re-plan there depends on the previous
result, which is exactly why ``bench.py`` keeps single-dispatch as the
headline regime.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


def _default_fetch(out: Any) -> Any:
    # device_get forces completion by value transfer —
    # ``jax.block_until_ready`` is a no-op on some experimental runtimes
    # (the axon tunnel), so syncing must go through a fetch.
    return jax.device_get(out)


def pipelined_map(fn: Callable[[Any], Any], items: Iterable[Any],
                  depth: int = 8,
                  fetch: Optional[Callable[[Any], Any]] = None
                  ) -> Iterator[Any]:
    """Map ``fn`` over ``items`` keeping up to ``depth`` device dispatches
    in flight; yields fetched results in input order.

    Args:
      fn: jitted request handler ``fn(item) -> pytree of arrays``.
      items: iterable of requests (each a single argument; pack tuples
        yourself).
      depth: maximum dispatches in flight.  1 degenerates to a plain
        fetch-each-result loop.
      fetch: host materializer applied to each completed result (default
        ``jax.device_get``).  Pass a narrower fetch (e.g. ``lambda r:
        float(r.value[0])``) to avoid transferring unneeded outputs.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    fetch = fetch or _default_fetch
    inflight: deque = deque()
    for item in items:
        inflight.append(fn(item))
        if len(inflight) >= depth:
            yield fetch(inflight.popleft())
    while inflight:
        yield fetch(inflight.popleft())
