"""Solver-state checkpointing.

The reference has no checkpoint/resume at all (SURVEY.md §5): the only
state carried across solves is in-memory warm-start state inside mutable
solver structs.  Here that state is already an explicit pytree
(``CEState`` / ``NMState`` / ``PETSState`` / MPC warm starts), so
persisting an MPC controller across process restarts is a plain
save/load of the pytree — this module provides it with zero extra
dependencies (``.npz`` + a structure descriptor).
"""
from __future__ import annotations

import json
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def save_state(path: str, state: Any) -> None:
    """Serialize a solver-state pytree to ``<path>`` (npz format).

    Handles array leaves, Python scalars and ``None`` (e.g. ``NMState``'s
    lazily-populated vertex costs).
    """
    leaves, treedef = jax.tree_util.tree_flatten(
        state, is_leaf=lambda x: x is None)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        if leaf is None:
            kinds.append("none")
            arrays[f"leaf_{i}"] = np.zeros(0)
        else:
            kinds.append("array")
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"kinds": kinds, "treedef": str(treedef)}).encode(),
        dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Any:
    """Load a solver-state pytree saved by :func:`save_state`.

    ``like`` is a template with the same structure (e.g. a freshly
    ``init_state()``-ed pytree) used to rebuild the container types and
    restore dtypes/placement.
    """
    data = np.load(path if str(path).endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    like_leaves, treedef = jax.tree_util.tree_flatten(
        like, is_leaf=lambda x: x is None)
    if len(like_leaves) != len(meta["kinds"]):
        raise ValueError(
            f"template has {len(like_leaves)} leaves, checkpoint has "
            f"{len(meta['kinds'])}")
    if meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint structure does not match the template: saved "
            f"{meta['treedef']}, template {treedef}")
    leaves = []
    for i, (kind, tmpl) in enumerate(zip(meta["kinds"], like_leaves)):
        if kind == "none":
            leaves.append(None)
        else:
            arr = data[f"leaf_{i}"]
            if tmpl is not None and hasattr(tmpl, "dtype"):
                leaves.append(jnp.asarray(arr, tmpl.dtype))
            elif isinstance(tmpl, float):
                leaves.append(float(arr))
            elif isinstance(tmpl, int):
                leaves.append(int(arr))
            else:
                leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
