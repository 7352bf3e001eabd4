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
        cost = res.value + kl_bound / thetas
        # NaN objective = failed solve -> Inf, identical to
        # ratilqr.make_cost_fn (the Inf-masking contract the reference pins
        # at cross_entropy_bilevel_optimization.jl:161-166).  Without it a
        # NaN lane diverges from the unsharded bank: top_k(-c) sorts NaN
        # FIRST, poisoning the elite refit.
        return jnp.where(jnp.isnan(cost), jnp.asarray(jnp.inf, cost.dtype),
                         cost)

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


def sharded_elite_selection(mesh: Mesh, us: Array, costs: Array,
                            num_elite: int) -> Array:
    """Communication-optimal elite selection: per-shard ``top_k(num_elite)``
    then a merged top-k over the (n_shards × num_elite) candidates.

    The naive path gathers ALL K costs+sequences to every device before
    ``top_k``; at the 10k+-rollout scale (``pets.jl:100-126`` fan-out) that
    all-gather is O(K·N·m) per device.  The global top-k is always a subset
    of the union of per-shard top-ks, so gathering only the per-shard
    winners — O(n_shards·num_elite·N·m) — is exact (identical result for
    distinct costs) and shrinks the collective by K/(n_shards·num_elite).

    ``us``: (K, N, m) control bank, sharded on the sample axis;
    ``costs``: (K,).  Returns the (num_elite, N, m) elite bank, replicated.
    """

    def local(us_l, costs_l):
        # A shard contributes at most its own size to the global top-k.
        local_k = min(num_elite, costs_l.shape[0])
        _, idx = lax.top_k(-costs_l, local_k)
        cand_us, cand_c = us_l[idx], costs_l[idx]
        all_us = lax.all_gather(cand_us, SAMPLE_AXIS, tiled=True)
        all_c = lax.all_gather(cand_c, SAMPLE_AXIS, tiled=True)
        _, gidx = lax.top_k(-all_c, num_elite)
        return all_us[gidx]

    # check_vma=False: the varying-axes analysis cannot statically prove
    # the output replicated, but it is by construction — every device runs
    # the same top_k on the same all-gathered candidate set.
    return shard_map(local, mesh=mesh,
                     in_specs=(P(SAMPLE_AXIS), P(SAMPLE_AXIS)),
                     out_specs=P(), check_vma=False)(us, costs)


def make_sharded_fleet_runner(mesh: Mesh, plan_step, simulate,
                              num_steps: int, stage_cost, fallback=None):
    """Monte-Carlo episode fleet with the seed axis sharded over the mesh.

    Multi-chip version of :func:`ratilqr_tpu.mpc_episode.make_fleet_runner`:
    each device runs the full closed-loop episodes for its shard of the
    PRNG-key batch (episodes are embarrassingly parallel — no cross-seed
    communication, so scaling rides entirely on placement).  Numerics are
    identical to the unsharded fleet.  Requires ``len(keys) % mesh size
    == 0``.
    """
    from ratilqr_tpu.mpc_episode import make_episode_runner

    run = make_episode_runner(plan_step, simulate, num_steps, stage_cost,
                              fallback)
    shard = NamedSharding(mesh, P(SAMPLE_AXIS))

    n_shards = mesh.shape[SAMPLE_AXIS]

    @jax.jit
    def _fleet(x0, u_init, keys, plan_state):
        keys = lax.with_sharding_constraint(keys, shard)
        return jax.vmap(run, in_axes=(None, None, 0, None))(
            x0, u_init, keys, plan_state)

    def fleet(x0, u_init, keys, plan_state):
        if len(keys) % n_shards != 0:
            raise ValueError(
                f"number of episode keys ({len(keys)}) must divide evenly "
                f"over the {n_shards}-device '{SAMPLE_AXIS}' mesh axis")
        return _fleet(x0, u_init, keys, plan_state)

    return fleet


def make_sharded_pets_solve(problem: GenerativeProblem, config: PETSConfig,
                            mesh: Mesh, use_true_model: bool = False,
                            shard_elites: bool = False):
    """Fully-jitted PETS solve with the control-sample axis sharded.

    The CEM state (μ, Σ) is replicated; each generation samples the control
    bank, constrains it onto the mesh, evaluates rollouts shard-locally and
    selects elites globally.  With ``shard_elites=False`` XLA inserts the
    full gather for ``top_k``; ``shard_elites=True`` uses the
    communication-optimal :func:`sharded_elite_selection` (per-shard top-k,
    merged) — exact for distinct costs, and the right choice at 10k+
    rollout scale.  Numerics are identical to
    :func:`ratilqr_tpu.solvers.pets.solve`.
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
            if shard_elites:
                elites = sharded_elite_selection(mesh, us, costs,
                                                 config.num_elite)
            else:
                elites, _ = pets_mod.get_elite_samples(us, costs,
                                                       config.num_elite)
            carry = pets_mod.compute_new_distribution(
                carry, elites, config.smoothing_factor)
            return carry._replace(iter_current=carry.iter_current + 1), None

        keys = jax.random.split(key, config.iter_max)
        state, _ = lax.scan(body, state, keys)
        return state

    return sharded_solve
