"""PETS — Cross-Entropy Method directly over control sequences.

TPU-native counterpart of ``CrossEntropyDirectOptimizationSolver``
(``/root/reference/src/pets.jl:35-281``).

The reference's hot loop is a 3-deep serial Julia loop (control samples ×
Monte-Carlo trajectory samples × time steps, ``pets.jl:137-155``) optionally
fanned out per control sample over worker processes with ``randjump`` RNG
streams (``pets.jl:100-126``).  Here the whole generation is one fused
device computation: ``vmap`` over control samples × ``vmap`` over trajectory
samples × ``lax.scan`` over time, with counter-based PRNG keys replacing
``randjump`` stream-splitting.  The full ``solve`` is a single jitted
``lax.scan`` over CEM iterations — zero host round-trips.

For multi-host scale the control-sample axis shards over a device mesh (see
``ratilqr_tpu.parallel``); elite selection is a ``top_k`` after gathering
per-shard costs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ratilqr_tpu.config import PETSConfig
from ratilqr_tpu.ops.rollout import rollout_generative
from ratilqr_tpu.problems import GenerativeProblem

Array = jnp.ndarray


class PETSState(NamedTuple):
    """Per-timestep Gaussian control distribution (``pets.jl:44-49``):
    ``u_k ~ N(mu[k], sigma[k])``."""
    mu: Array        # (N, m)
    sigma: Array     # (N, m, m)
    iter_current: Array  # ()


def init_state(mu_init: Array, sigma_init: Array) -> PETSState:
    """``initialize!`` (``pets.jl:70-74``)."""
    return PETSState(mu=jnp.asarray(mu_init),
                     sigma=jnp.asarray(sigma_init),
                     iter_current=jnp.zeros((), jnp.int32))


def sample_control_sequences(state: PETSState, key: Array,
                             num_samples: int) -> Array:
    """Draw ``num_samples`` control sequences ``u_t ~ MvNormal(μ_t, Σ_t)``
    (``pets.jl:208-216``) as one batched reparameterized draw."""
    N, m = state.mu.shape
    chol = jnp.linalg.cholesky(state.sigma)            # (N, m, m)
    z = jax.random.normal(key, (num_samples, N, m), dtype=state.mu.dtype)
    return state.mu[None] + jnp.einsum("nij,knj->kni", chol, z)


def compute_cost(problem: GenerativeProblem, config: PETSConfig, x0: Array,
                 control_sequences: Array, key: Array,
                 use_true_model: bool = False) -> Array:
    """Mean Monte-Carlo rollout cost per control sequence.

    Counterpart of ``compute_cost`` / ``compute_cost_serial``
    (``pets.jl:100-157``): for each of the K sequences, average the total
    cost of ``num_trajectory_samples`` stochastic rollouts.  One
    ``vmap × vmap × scan`` — the 10k+-rollout workload that shards across a
    pod slice (SURVEY.md §2 parallelism table).
    """
    K = control_sequences.shape[0]
    T = config.num_trajectory_samples
    # shape-tuple split works for both typed and legacy uint32 keys
    keys = jax.random.split(key, (K, T))

    def one_rollout(u_seq, k):
        return rollout_generative(problem, x0, u_seq, k, use_true_model,
                                  unroll=config.scan_unroll)[1]

    def one_sequence(u_seq, ks):
        return jnp.mean(jax.vmap(lambda k: one_rollout(u_seq, k))(ks))

    return jax.vmap(one_sequence)(control_sequences, keys)


def get_elite_samples(control_sequences: Array, costs: Array,
                      num_elite: int) -> Tuple[Array, Array]:
    """Top-``num_elite`` lowest-cost sequences (``pets.jl:159-171``) via
    ``top_k`` instead of a host sort.  Returns ``(elites, indices)``."""
    _, idx = lax.top_k(-costs, num_elite)
    return control_sequences[idx], idx


def compute_new_distribution(state: PETSState, elites: Array,
                             smoothing_factor: float) -> PETSState:
    """Refit the per-timestep Gaussian to the elites with exponential
    smoothing (``pets.jl:173-191``): diagonal covariance from the *unbiased*
    elite variance (Julia ``var``), mean/cov smoothed toward the previous
    distribution."""
    s = smoothing_factor
    mean_e = jnp.mean(elites, axis=0)                         # (N, m)
    var_e = jnp.var(elites, axis=0, ddof=1)                   # (N, m)
    cov_e = jax.vmap(jnp.diag)(var_e)                         # (N, m, m)
    return state._replace(mu=(1.0 - s) * mean_e + s * state.mu,
                          sigma=(1.0 - s) * cov_e + s * state.sigma)


def step(problem: GenerativeProblem, config: PETSConfig, x0: Array,
         state: PETSState, key: Array,
         use_true_model: bool = False) -> PETSState:
    """One CEM generation (``step!``, ``pets.jl:193-245``)."""
    key_u, key_c = jax.random.split(key)
    us = sample_control_sequences(state, key_u, config.num_control_samples)
    costs = compute_cost(problem, config, x0, us, key_c, use_true_model)
    elites, _ = get_elite_samples(us, costs, config.num_elite)
    state = compute_new_distribution(state, elites, config.smoothing_factor)
    return state._replace(iter_current=state.iter_current + 1)


@partial(jax.jit, static_argnums=(0, 1, 5))
def solve(problem: GenerativeProblem, config: PETSConfig, x0: Array,
          state: PETSState, key: Array,
          use_true_model: bool = False) -> PETSState:
    """PETS ``solve!`` (``pets.jl:270-281``): ``iter_max`` CEM generations,
    returning the final control distribution ``(μ, Σ)`` = open-loop policy.
    Fully jitted — the iteration loop is a ``lax.scan`` on-device.
    """

    def body(carry, k):
        return step(problem, config, x0, carry, k, use_true_model), None

    keys = jax.random.split(key, config.iter_max)
    state, _ = lax.scan(body, state, keys)
    return state


@dataclasses.dataclass
class PETSSolver:
    """Stateful wrapper mirroring the reference's solver-object usage: holds
    the initial distribution and re-solves from it each MPC re-plan
    (``pets.jl:52-74``)."""
    problem: GenerativeProblem
    mu_init: Array
    sigma_init: Array
    config: PETSConfig = PETSConfig()

    def solve(self, x0: Array, key: Array,
              use_true_model: bool = False) -> Tuple[Array, Array]:
        state = init_state(self.mu_init, self.sigma_init)
        out = solve(self.problem, self.config, x0, state, key,
                    use_true_model)
        return out.mu, out.sigma
