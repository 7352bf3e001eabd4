"""MPC driver tests: closed-loop regulation with warm starts (SURVEY.md
§3.5 usage pattern)."""
import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import ILEQGConfig, ileqg_solve
from ratilqr_tpu.models import lqr_problem
from ratilqr_tpu.mpc import MPCDriver, affine_policy_control, shift_warm_start


def test_shift_warm_start():
    l = jnp.arange(6.0).reshape(3, 2)
    s = shift_warm_start(l)
    np.testing.assert_array_equal(np.asarray(s),
                                  [[2.0, 3.0], [4.0, 5.0], [4.0, 5.0]])


def test_affine_policy_feedback_correction():
    l = jnp.array([[1.0, 0.0]])
    L = jnp.array([[[0.5, 0.0], [0.0, 0.5]]])
    x_ref = jnp.array([[2.0, 2.0]])
    u = affine_policy_control(jnp.array([3.0, 2.0]), x_ref, l, L)
    np.testing.assert_allclose(np.asarray(u), [1.5, 0.0])


def test_closed_loop_ilqg_regulates():
    prob = lqr_problem(N=10, noise=1e-4)
    cfg = ILEQGConfig()

    class Plan:
        def __call__(self, x, u_warm, key):
            return ileqg_solve(prob, cfg, x, u_warm, 0.0)

    driver = MPCDriver(problem=prob, plan=Plan())
    x0 = jnp.array([3.0, -2.0], jnp.float64)
    steps = driver.run(x0, jnp.zeros((10, 2), jnp.float64),
                       jax.random.key(0), num_steps=8)
    assert len(steps) == 8
    # Closed-loop LQR on a double integrator contracts toward the origin.
    assert float(jnp.linalg.norm(steps[-1].x)) < 0.2 * float(
        jnp.linalg.norm(steps[0].x))
    for s in steps:
        assert np.isfinite(float(s.value))
        assert s.plan_time_s > 0
