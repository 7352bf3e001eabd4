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


class ILEQGBankServer:
    """Dynamic request batching for iLEQG solves.

    A production serve loop receives heterogeneous requests ``(x0, u_init,
    θ)`` — different fleets, different warm starts — while the device wants
    one fixed-shape bank per dispatch (recompiles are 10s–100s through the
    tunnel).  This server pads any request batch up to a fixed
    ``bank_size``, dispatches ONE jitted bank vmapped over all three
    request fields, and slices the padding away; batches larger than the
    bank are chunked and streamed through :func:`pipelined_map` so `depth`
    banks stay in flight.

    Padding lanes solve the trivial ``(x0=0, u=0, θ=0)`` problem and are
    discarded — they cannot contaminate real lanes (lanes are independent
    under ``vmap``).

    Example::

        server = ILEQGBankServer(problem, ILEQGConfig(), bank_size=2048)
        results = server.solve_batch(x0s, u_inits, thetas)   # any count
    """

    def __init__(self, problem, config, bank_size: int = 2048,
                 depth: int = 8):
        from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve

        self.bank_size = int(bank_size)
        self.depth = int(depth)
        self._bank = jax.jit(jax.vmap(
            lambda x, u, th: ileqg_solve(problem, config, x, u, th)))

    def _pad(self, a):
        import jax.numpy as jnp
        a = jnp.asarray(a)
        k = self.bank_size - a.shape[0]
        if k == 0:
            return a
        pad = jnp.zeros((k,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    def solve_batch(self, x0s, u_inits, thetas):
        """Solve ``len(thetas)`` requests (any count); returns the stacked
        ``ILEQGResult`` with exactly one leading entry per request, in
        order."""
        import jax.numpy as jnp
        x0s, u_inits = jnp.asarray(x0s), jnp.asarray(u_inits)
        thetas = jnp.asarray(thetas)
        n = thetas.shape[0]
        if not (x0s.shape[0] == u_inits.shape[0] == n):
            raise ValueError(
                f"request fields disagree: {x0s.shape[0]} x0s, "
                f"{u_inits.shape[0]} u_inits, {n} thetas")
        B = self.bank_size
        chunks = [(x0s[i:i + B], u_inits[i:i + B], thetas[i:i + B])
                  for i in range(0, n, B)]

        def run(chunk):
            cx, cu, cth = chunk
            k = cth.shape[0]
            out = self._bank(self._pad(cx), self._pad(cu), self._pad(cth))
            return jax.tree_util.tree_map(lambda a: a[:k], out)

        outs = list(pipelined_map(run, chunks, depth=self.depth))
        return jax.tree_util.tree_map(
            lambda *xs: jax.numpy.concatenate(xs, axis=0), *outs)


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
