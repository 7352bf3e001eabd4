"""Shared pytest fixtures importable from test modules."""
import jax
import jax.numpy as jnp
import pytest

from ratilqr_tpu.problems import GenerativeProblem


@pytest.fixture
def pets_uniform_problem() -> GenerativeProblem:
    """The PETS test fixture (``test/pets_test.jl:12-15``): additive-uniform
    generative integrator with state-independent cost ``Σ|u|``."""

    def f_stochastic(x, u, key, use_true_model=False):
        return x + u + jax.random.uniform(key, x.shape, dtype=x.dtype)

    return GenerativeProblem(
        f_stochastic=f_stochastic,
        c=lambda k, x, u: jnp.sum(jnp.abs(u)),
        h=lambda x: jnp.asarray(1.0, x.dtype),
        N=20)
