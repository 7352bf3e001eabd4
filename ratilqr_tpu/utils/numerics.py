"""Small numeric helpers shared across solvers."""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def isapprox(a: Array, b: Array) -> Array:
    """Julia-style ``a ≈ b``: ``|a−b| ≤ √eps(dtype)·max(|a|,|b|)``.

    The iLEQG line-search acceptance rule is
    ``value_new ≈ value_current || value_new < value_current``
    (``/root/reference/src/ileqg.jl:538``); Julia's default ``isapprox`` uses
    ``rtol = sqrt(eps)`` and ``atol = 0``.  The rtol here follows the working
    dtype so float32 runs stay meaningfully comparable.
    """
    a = jnp.asarray(a)
    rtol = jnp.sqrt(jnp.finfo(a.dtype).eps).astype(a.dtype)
    return jnp.abs(a - b) <= rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))


def max_control_deviation(l_traj: Array, u_traj: Array) -> Array:
    """``max_t ‖l_t − u_t‖₂`` — the solver's convergence error norm
    (``ileqg.jl:539``)."""
    return jnp.max(jnp.linalg.norm(l_traj - u_traj, axis=-1))
