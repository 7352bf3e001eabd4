"""Probe: what layout does TPU XLA assign to the outer while-loop carry?

Hypothesis for the ~25 ms carry-select residual at B=65,536
(docs/performance.md "Post-fused budget"): the carried ``l (B,T,m)`` /
``L (B,T,m,n)`` leaves have tiny minor dims (m=2, n=3) that the TPU's
(8,128) tiling pads heavily, so every batching-rule select sweeps many
times the logical bytes.  If true, flattening the per-lane trailing dims
to one axis — ``(B, T*m)`` / ``(B, T*m*n)`` — removes the padding.

This script (a) dumps the while-loop carry layouts from the compiled HLO
of a shape-faithful toy loop, and (b) times select sweeps in both
layouts.  Run on the TPU backend (the tunnel); CPU layouts say nothing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def fetch(x):
    return np.asarray(jax.device_get(x))


B, T, M, N = 65536, 100, 2, 3
ROUNDS = 16


def make_loop(flat: bool):
    """A while loop mimicking the bank's carry: per-lane mask select on
    (l, L)-shaped leaves each round.  Multiplies keep values alive
    (anti-DCE) and distinct per round (anti-CSE)."""

    def run(l, L, mask):
        def cond(c):
            return c[2] < ROUNDS

        def body(c):
            l, L, i = c
            scale = 1.0 + 1e-6 * i.astype(l.dtype)
            l_new = l * scale
            L_new = L * scale
            keep = mask if not flat else mask
            bc_l = keep.reshape((B,) + (1,) * (l.ndim - 1))
            bc_L = keep.reshape((B,) + (1,) * (L.ndim - 1))
            return (jnp.where(bc_l, l, l_new),
                    jnp.where(bc_L, L, L_new), i + 1)

        l, L, i = lax.while_loop(cond, body, (l, L, jnp.zeros((), jnp.int32)))
        return l.sum() + L.sum()

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    mask = jnp.arange(B) % 3 == 0
    for flat in (False, True):
        if flat:
            l = jnp.ones((B, T * M), jnp.float32)
            L = jnp.ones((B, T * M * N), jnp.float32)
        else:
            l = jnp.ones((B, T, M), jnp.float32)
            L = jnp.ones((B, T, M, N), jnp.float32)
        fn = make_loop(flat)
        lowered = fn.lower(l, L, mask)
        compiled = lowered.compile()
        txt = compiled.as_text()
        # Print the while-loop tuple shapes with layouts.
        for line in txt.splitlines():
            if ("while(" in line or "while.body" in line.split("=")[0]
                    if "=" in line else False):
                pass
        carried = [ln.strip() for ln in txt.splitlines()
                   if "f32[" in ln and "{" in ln and "while" in ln]
        print(f"--- flat={flat}: while lines ({len(carried)}):")
        for ln in carried[:6]:
            print("   ", ln[:220])
        # Warm + time.
        out = fetch(fn(l, L, mask))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fetch(fn(l, L, mask))
        dt = (time.perf_counter() - t0) / reps
        per_round_ms = dt * 1e3 / ROUNDS
        logical_mb = (l.size + L.size) * 4 / 1e6
        print(f"flat={flat}: {dt*1e3:.2f} ms/call, {per_round_ms:.3f} "
              f"ms/round, logical carry {logical_mb:.0f} MB, out={out:.3f}")


if __name__ == "__main__":
    main()
