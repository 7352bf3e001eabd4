"""Mesh-sharded solver banks: PETS rollout sharding and CE θ-bank sharding.

Two complementary mechanisms (both produce identical numerics to the
single-device paths — sharding changes placement, not math):

1. **GSPMD sharding constraints** (:func:`make_sharded_pets_solve`,
   :func:`make_sharded_theta_cost_fn`): annotate the sample axis with
   ``with_sharding_constraint`` inside ``jit`` and let XLA partition the
   embarrassingly-parallel rollouts and insert the gather for ``top_k``.
   This is the default production path — zero manual collectives.

2. **Explicit ``shard_map`` + collectives**
   (:func:`compute_cost_shard_map`): per-shard cost evaluation with an
   ``all_gather`` of per-shard costs, the pattern that scales to multi-host
   pod slices where explicit collective placement matters (SURVEY.md §2
   distributed-backend mapping).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ratilqr_tpu.config import CrossEntropyConfig, PETSConfig
from ratilqr_tpu.problems import GenerativeProblem, RiskSensitiveProblem
from ratilqr_tpu.parallel.mesh import SAMPLE_AXIS
from ratilqr_tpu.solvers import pets as pets_mod
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve

Array = jnp.ndarray


def make_sharded_theta_cost_fn(problem: RiskSensitiveProblem,
                               config: CrossEntropyConfig, mesh: Mesh):
    """CE outer-objective bank with the θ axis sharded over the mesh.

    Replaces the reference's per-θ ``remotecall_fetch`` fan-out
    (``cross_entropy_bilevel_optimization.jl:180-192``): each device runs
    the full iLEQG solves for its shard of the θ-bank; results gather for
    the elite refit.  Drop-in replacement for
    :func:`ratilqr_tpu.solvers.ratilqr.make_cost_fn`.
    """
    shard = NamedSharding(mesh, P(SAMPLE_AXIS))

    @jax.jit
    def cost_fn(x0, u_init, thetas, kl_bound):
        thetas = lax.with_sharding_constraint(thetas, shard)
        res = jax.vmap(lambda th: ileqg_solve(problem, config.ileqg, x0,
                                              u_init, th))(thetas)
        return res.value + kl_bound / thetas

    return cost_fn


def compute_cost_shard_map(problem: GenerativeProblem, config: PETSConfig,
                           mesh: Mesh, x0: Array, control_sequences: Array,
                           key: Array, use_true_model: bool = False
                           ) -> Array:
    """PETS Monte-Carlo cost evaluation as an explicit ``shard_map``.

    Each device evaluates its shard of control sequences (the reference's
    per-worker ``compute_cost_worker`` unit, ``pets.jl:76-98``) with
    deterministically folded PRNG keys (replacing ``randjump`` streams,
    ``pets.jl:114-116``); the sharded output spec reassembles the global
    cost vector.  Requires ``num_control_samples % mesh size == 0``.
    """
    n_shards = mesh.shape[SAMPLE_AXIS]
    K = control_sequences.shape[0]
    if K % n_shards != 0:
        raise ValueError(
            f"num_control_samples ({K}) must divide evenly over the "
            f"{n_shards}-device '{SAMPLE_AXIS}' mesh axis")

    def local_cost(x0_l, us_l, key_l):
        # Mark replicated operands as device-varying up front so the scan
        # carry (which mixes them with the sharded controls) type-checks
        # under shard_map's varying-axes analysis.
        if hasattr(lax, "pcast"):
            x0_l = lax.pcast(x0_l, SAMPLE_AXIS, to="varying")
        else:  # older JAX
            x0_l = lax.pvary(x0_l, (SAMPLE_AXIS,))
        # Per-device deterministic stream: fold in the shard index
        # (the counter-based analogue of randjump's 10^20 stream jumps).
        idx = lax.axis_index(SAMPLE_AXIS)
        local_key = jax.random.fold_in(key_l, idx)
        return pets_mod.compute_cost(problem, config, x0_l, us_l,
                                     local_key, use_true_model)

    fn = shard_map(
        local_cost, mesh=mesh,
        in_specs=(P(), P(SAMPLE_AXIS), P()),
        out_specs=P(SAMPLE_AXIS))
    return fn(x0, control_sequences, key)


def make_sharded_pets_solve(problem: GenerativeProblem, config: PETSConfig,
                            mesh: Mesh, use_true_model: bool = False):
    """Fully-jitted PETS solve with the control-sample axis sharded.

    The CEM state (μ, Σ) is replicated; each generation samples the control
    bank, constrains it onto the mesh, evaluates rollouts shard-locally and
    selects elites globally (XLA inserts the gather for ``top_k``).
    Numerics are identical to :func:`ratilqr_tpu.solvers.pets.solve`.
    """
    shard = NamedSharding(mesh, P(SAMPLE_AXIS))

    @jax.jit
    def sharded_solve(x0, state, key):
        def body(carry, k):
            key_u, key_c = jax.random.split(k)
            us = pets_mod.sample_control_sequences(
                carry, key_u, config.num_control_samples)
            us = lax.with_sharding_constraint(us, shard)
            costs = pets_mod.compute_cost(problem, config, x0, us, key_c,
                                          use_true_model)
            elites, _ = pets_mod.get_elite_samples(us, costs,
                                                   config.num_elite)
            carry = pets_mod.compute_new_distribution(
                carry, elites, config.smoothing_factor)
            return carry._replace(iter_current=carry.iter_current + 1), None

        keys = jax.random.split(key, config.iter_max)
        state, _ = lax.scan(body, state, keys)
        return state

    return sharded_solve
