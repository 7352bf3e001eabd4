"""Solver-state checkpointing.

The reference has no checkpoint/resume at all (SURVEY.md §5): the only
state carried across solves is in-memory warm-start state inside mutable
solver structs.  Here that state is already an explicit pytree
(``CEState`` / ``NMState`` / ``PETSState`` / MPC warm starts), so
persisting an MPC controller across process restarts is a plain
save/load of the pytree — this module provides it with zero extra
dependencies (``.npz`` + a structure descriptor).

Each leaf's kind (``none``/``float``/``int``/``bool``/``array``) is
recorded at save time and restored by that saved kind — so a checkpoint
written after e.g. ``NMState``'s ``c_high``/``c_low`` bootstrap (concrete
Python floats) round-trips to floats even when loaded against a fresh
``init_state()`` template whose corresponding leaves are still ``None``.
Structure is validated by the leaves' *key paths* (field names), which are
stable across JAX versions, unlike ``str(treedef)``.
"""
from __future__ import annotations

import json
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _flatten(tree: Any):
    """Flatten with key paths; ``None`` is a leaf (lazily-populated slots)."""
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None)
    paths = [jax.tree_util.keystr(p) for p, _ in path_leaves]
    leaves = [leaf for _, leaf in path_leaves]
    return paths, leaves, treedef


def _leaf_kind(leaf: Any) -> str:
    if leaf is None:
        return "none"
    if isinstance(leaf, bool):       # before int: bool is an int subclass
        return "bool"
    if isinstance(leaf, float):
        return "float"
    if isinstance(leaf, int):
        return "int"
    return "array"


def save_state(path: str, state: Any) -> None:
    """Serialize a solver-state pytree to ``<path>`` (npz format).

    Handles array leaves, Python scalars and ``None`` (e.g. ``NMState``'s
    lazily-populated vertex costs).
    """
    paths, leaves, _ = _flatten(state)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        kinds.append(_leaf_kind(leaf))
        arrays[f"leaf_{i}"] = (np.zeros(0) if leaf is None
                               else np.asarray(leaf))
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"kinds": kinds, "paths": paths}).encode(),
        dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Any:
    """Load a solver-state pytree saved by :func:`save_state`.

    ``like`` is a template with the same structure (e.g. a freshly
    ``init_state()``-ed pytree) used to rebuild the container types and
    restore array dtypes/placement.  Scalar leaves are restored by the kind
    recorded at save time, so a template ``None`` slot whose checkpoint
    holds a concrete float comes back as a Python float, not a 0-d array.
    """
    data = np.load(path if str(path).endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    like_paths, like_leaves, treedef = _flatten(like)
    if len(like_leaves) != len(meta["kinds"]):
        raise ValueError(
            f"template has {len(like_leaves)} leaves, checkpoint has "
            f"{len(meta['kinds'])}")
    saved_paths = meta.get("paths")
    if saved_paths is not None and saved_paths != like_paths:
        mismatched = [f"{s!r} vs {t!r}" for s, t
                      in zip(saved_paths, like_paths) if s != t]
        raise ValueError(
            "checkpoint structure does not match the template; "
            f"mismatched leaf paths: {', '.join(mismatched)}")
    leaves = []
    for i, (kind, tmpl) in enumerate(zip(meta["kinds"], like_leaves)):
        if kind == "none":
            leaves.append(None)
            continue
        arr = data[f"leaf_{i}"]
        if kind == "float":
            leaves.append(float(arr))
        elif kind == "int":
            leaves.append(int(arr))
        elif kind == "bool":
            leaves.append(bool(arr))
        elif tmpl is not None and hasattr(tmpl, "dtype"):
            leaves.append(jnp.asarray(arr, tmpl.dtype))
        else:
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
