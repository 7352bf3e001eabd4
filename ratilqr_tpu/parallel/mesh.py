"""Device-mesh utilities — the TPU-native replacement for the reference's
Julia ``Distributed`` backend (SURVEY.md §2 C11).

The reference scatters closures to worker processes with
``remotecall_fetch`` round-robin (``cross_entropy_bilevel_optimization.jl:
180-192``, ``pets.jl:108-125``).  Here distribution is data parallelism over
a ``jax.sharding.Mesh``: sample axes (θ-samples, CEM control samples) are
sharded across devices, collectives ride ICI, and the single-controller
runtime replaces master/worker RPC.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = SAMPLE_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D device mesh over the sample axis.

    The workloads here have a single embarrassingly-parallel sample
    dimension and no parameters to shard (SURVEY.md §2 parallelism table),
    so a 1-D mesh is the whole story; ``axis_name`` defaults to
    ``"samples"``.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def sample_sharding(mesh: Mesh, axis_name: str = SAMPLE_AXIS
                    ) -> NamedSharding:
    """Sharding that splits the leading (sample) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_initialize(**kwargs) -> None:
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    On a multi-host pod slice call this once per host before building the
    global mesh; single-host/single-chip runs skip it.  The reference's
    analogue is the user-side ``addprocs`` (``test/runtests.jl:11-13``).
    """
    jax.distributed.initialize(**kwargs)
