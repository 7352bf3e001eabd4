"""Dimension-coverage tests: the solver stack (and the Pallas kernel's
unrolled algebra) across the reference's n/m range — cartpole (4,1) and
quadrotor (12,4), beyond the 2-3 dim fixtures."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.models import cartpole, quadrotor
from ratilqr_tpu.ops.approx import approximate_model
from ratilqr_tpu.ops.riccati import _riccati_core
from ratilqr_tpu.ops.riccati_pallas import riccati_bank
from ratilqr_tpu.ops.rollout import rollout_open_loop_with_jac


@pytest.mark.parametrize("mk,n,m,x0", [
    (cartpole, 4, 1, [0.3, 0.0, 0.4, 0.0]),
    (quadrotor, 12, 4, [0.0] * 12),
], ids=["cartpole", "quadrotor"])
def test_solver_stack_at_dimension(mk, n, m, x0):
    prob = mk(N=20)
    x0 = jnp.asarray(x0, jnp.float64)
    u0 = jnp.zeros((20, m), jnp.float64)
    res = ileqg_solve(prob, ILEQGConfig(iter_max=25), x0, u0, 0.0)
    assert not bool(res.failed)
    assert np.isfinite(float(res.value))
    assert res.L.shape == (20, m, n)
    # solver reduced the cost below the zero-control rollout cost
    from ratilqr_tpu import integrate_cost, rollout_open_loop
    x_zero = rollout_open_loop(prob, x0, u0)
    assert float(res.value) < float(integrate_cost(prob, x_zero, u0)) + 1e-9


@pytest.mark.parametrize("mk,n,m,x0", [
    (cartpole, 4, 1, [0.3, 0.0, 0.4, 0.0]),
    (quadrotor, 12, 4, [0.0] * 12),
], ids=["cartpole", "quadrotor"])
def test_pallas_kernel_at_dimension(mk, n, m, x0):
    # Odd matrix sizes (m=1, n=12) through the unrolled kernel algebra
    # (interpret mode on CPU).
    dt = jnp.float32
    T, B = 6, 3
    prob = mk(N=T, dtype=dt)
    x0s = jnp.asarray(x0, dt)[None].repeat(B, 0)
    x0s = x0s + 0.01 * jax.random.normal(jax.random.key(0), x0s.shape, dt)
    us = 0.01 * jax.random.normal(jax.random.key(1), (B, T, m), dt)
    thetas = jnp.array([0.0, 0.001, 0.005], dt)
    mus = jnp.zeros((B,), dt)

    def make_ap(x0_, u_):
        x, A, Bm = rollout_open_loop_with_jac(prob, x0_, u_)
        return approximate_model(prob, u_, x, A, Bm)

    ap_b = jax.vmap(make_ap)(x0s, us)
    ref = jax.vmap(lambda ap, th, mu: _riccati_core(ap, th, mu, None,
                                                    None))(ap_b, thetas,
                                                           mus)
    out = riccati_bank(ap_b, thetas, mus)
    np.testing.assert_allclose(np.asarray(out.s[:, 0]),
                               np.asarray(ref[0].s[:, 0]), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(out.L), np.asarray(ref[1]),
                               rtol=5e-4, atol=1e-5)


def test_unicycle_analytic_jacobian_path_matches_ad():
    # The f_jac fast path (reference f_returns_jacobian protocol) must be a
    # pure performance switch: identical solve results to the AD path.
    import jax
    import numpy as np

    from ratilqr_tpu import ILEQGConfig, ileqg_solve
    from ratilqr_tpu.models import unicycle

    dt = jnp.float64
    p_ad = unicycle(N=20, dtype=dt)
    p_an = unicycle(N=20, dtype=dt, analytic_jacobians=True)
    assert not p_ad.has_jacobian and p_an.has_jacobian
    x0 = jnp.asarray([0.4, -0.3, 0.2], dt)
    u0 = 0.1 * jnp.ones((20, 2), dt)
    cfg = ILEQGConfig(iter_max=15)
    for theta in (0.0, 0.01):
        r_ad = ileqg_solve(p_ad, cfg, x0, u0, theta)
        r_an = ileqg_solve(p_an, cfg, x0, u0, theta)
        np.testing.assert_allclose(float(r_an.value), float(r_ad.value),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r_an.l), np.asarray(r_ad.l),
                                   rtol=1e-9, atol=1e-12)
