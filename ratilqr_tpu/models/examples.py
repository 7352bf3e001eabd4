"""Example problems mirroring the reference's doc/test fixtures.

These are the analytic fixtures the reference uses throughout its docs and
test suite (SURVEY.md §4): the 2-D single integrator
(``docs/source/getting-started.md:52-62``), a quadratic LQR problem
(``test/ileqg_test.jl:68-69``), the nonlinear ``x^1.3 + u^1.5`` toy
(``test/ileqg_test.jl:151-155``), a stochastic unicycle, and the
Gaussian-vs-GMM generative integrator
(``optimal_control_problems.jl:102-116``).

PERFORMANCE NOTE: problem functions must capture only Python/numpy
constants, never ``jnp`` device arrays.  A closed-over device array becomes
a per-call argument of every executable that traces the function —
measured at ~27 ms per call of pure overhead on the tunneled TPU backend —
whereas numpy/Python constants bake into the program as literals.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ratilqr_tpu.problems import GenerativeProblem, RiskSensitiveProblem


def double_integrator(N: int = 10, noise: float = 0.1,
                      dtype=jnp.float64) -> RiskSensitiveProblem:
    """2-D single integrator with time-weighted quadratic costs
    (``docs/source/getting-started.md:52-62``)."""
    eye = np.eye(2)

    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: k / 2.0 * (x @ x) + k / 2.0 * (u @ u),
        h=lambda x: N / 2.0 * (x @ x),
        W=lambda k: jnp.asarray(noise * eye, dtype),
        N=N,
        f_jac=lambda x, u: (x + u, jnp.asarray(eye, dtype),
                            jnp.asarray(eye, dtype)),
    )


def lqr_problem(N: int = 10, noise: float = 1.0,
                dtype=jnp.float64) -> RiskSensitiveProblem:
    """Linear dynamics + time-invariant quadratic costs — the fixture whose
    iLQG gains must equal the textbook LQR Riccati solution
    (``test/ileqg_test.jl:68-69,87-106``)."""
    from ratilqr_tpu.ops.tile_model import lqr_tile_model
    eye = np.eye(2)
    return RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: 0.5 * (x @ x) + 1.0 * (u @ u),
        h=lambda x: 0.5 * (x @ x),
        W=lambda k: jnp.asarray(noise * eye, dtype),
        N=N,
        tile_model=lqr_tile_model(),
    )


def nonlinear_toy(N: int = 10, noise: float = 0.01,
                  dtype=jnp.float64) -> RiskSensitiveProblem:
    """Nonlinear smoke-test fixture ``f = x^1.3 + u^1.5``,
    ``c = Σ(x^2.5 + u^2.5)`` (``test/ileqg_test.jl:151-155``).  Only valid
    for non-negative states/controls (fractional powers), as in the
    reference test."""
    eye = np.eye(2)
    return RiskSensitiveProblem(
        f=lambda x, u: x ** 1.3 + u ** 1.5,
        c=lambda k, x, u: jnp.sum(x ** 2.5 + u ** 2.5),
        h=lambda x: jnp.asarray(1.0, dtype),
        W=lambda k: jnp.asarray(noise * eye, dtype),
        N=N,
    )


def unicycle(N: int = 100, dt: float = 0.1, noise: float = 1e-3,
             goal=(5.0, 5.0), dtype=jnp.float64,
             analytic_jacobians: bool = False) -> RiskSensitiveProblem:
    """Stochastic unicycle regulation — the nonlinear robot model family the
    RAT iLQR paper evaluates on (``README.md:20-25``; the repo itself ships
    only analytic fixtures, SURVEY.md §6).  State ``(px, py, heading)``,
    control ``(v, ω)``; additive Gaussian position/heading noise.

    ``analytic_jacobians=True`` supplies closed-form ``A/B`` via the
    ``f_jac`` protocol (the reference's ``f_returns_jacobian=true`` fast
    path, ``ileqg.jl:160-162``), skipping forward-mode AD in every rollout.
    """
    g = np.asarray(list(goal) + [0.0])
    W_np = noise * np.eye(3)

    def f(x, u):
        px, py, th = x[0], x[1], x[2]
        v, om = u[0], u[1]
        return jnp.stack([px + dt * v * jnp.cos(th),
                          py + dt * v * jnp.sin(th),
                          th + dt * om])

    def f_jac(x, u):
        th = x[2]
        v = u[0]
        s, co = jnp.sin(th), jnp.cos(th)
        one = jnp.ones((), x.dtype)
        zero = jnp.zeros((), x.dtype)
        x_next = jnp.stack([x[0] + dt * v * co, x[1] + dt * v * s,
                            th + dt * u[1]])
        A = jnp.stack([jnp.stack([one, zero, -dt * v * s]),
                       jnp.stack([zero, one, dt * v * co]),
                       jnp.stack([zero, zero, one])])
        B = jnp.stack([jnp.stack([dt * co, zero]),
                       jnp.stack([dt * s, zero]),
                       jnp.stack([zero, dt * one])])
        return x_next, A, B

    def c(k, x, u):
        dx = x - jnp.asarray(g, x.dtype)
        return 0.05 * (dx @ dx) + 0.05 * (u @ u)

    def h(x):
        dx = x - jnp.asarray(g, x.dtype)
        return 10.0 * (dx @ dx)

    from ratilqr_tpu.ops.tile_model import unicycle_tile_model
    return RiskSensitiveProblem(f=f, c=c, h=h,
                                W=lambda k: jnp.asarray(W_np, dtype), N=N,
                                f_jac=f_jac if analytic_jacobians else None,
                                tile_model=unicycle_tile_model(dt, goal))


def cartpole(N: int = 50, dt: float = 0.05, noise: float = 1e-4,
             dtype=jnp.float64) -> RiskSensitiveProblem:
    """Cart-pole swing-up/balance (n=4, m=1): state
    ``(x, ẋ, φ, φ̇)`` with φ=0 upright, control = horizontal force.
    Exercises odd control dimension (m=1) and a stiffer nonlinearity than
    the unicycle."""
    mc, mp, lp, grav = 1.0, 0.1, 0.5, 9.81
    W_np = noise * np.eye(4)

    def f(x, u):
        # Classic cart-pole with φ measured from UPRIGHT (φ=0 unstable):
        # gravity torque ∝ +sinφ destabilizes, so the controller must
        # actively balance.
        pos, vel, phi, om = x[0], x[1], x[2], x[3]
        force = u[0]
        sin, cos = jnp.sin(phi), jnp.cos(phi)
        temp = (force + mp * lp * om ** 2 * sin) / (mc + mp)
        phi_acc = ((grav * sin - cos * temp)
                   / (lp * (4.0 / 3.0 - mp * cos ** 2 / (mc + mp))))
        acc = temp - mp * lp * phi_acc * cos / (mc + mp)
        return jnp.stack([pos + dt * vel, vel + dt * acc,
                          phi + dt * om, om + dt * phi_acc])

    def c(k, x, u):
        return 0.1 * (x[0] ** 2 + x[1] ** 2 + 10.0 * x[2] ** 2
                      + x[3] ** 2) + 0.05 * u[0] ** 2

    def h(x):
        return 10.0 * (x[0] ** 2 + x[1] ** 2 + 10.0 * x[2] ** 2
                       + x[3] ** 2)

    from ratilqr_tpu.ops.tile_model import cartpole_tile_model
    return RiskSensitiveProblem(f=f, c=c, h=h,
                                W=lambda k: jnp.asarray(W_np, dtype), N=N,
                                tile_model=cartpole_tile_model(
                                    dt, mc, mp, lp, grav))


def quadrotor(N: int = 50, dt: float = 0.02, noise: float = 1e-5,
              goal=(1.0, 1.0, 1.0), dtype=jnp.float64
              ) -> RiskSensitiveProblem:
    """Simplified 12-state quadrotor (n=12, m=4): position, velocity,
    attitude (roll/pitch/yaw) and body rates with small-angle rotational
    kinematics; controls = total thrust offset + body torques.  Exercises
    the top of the reference's dimensional range (SURVEY.md §7: n,m up to
    ~13)."""
    grav = 9.81
    g_np = np.zeros(12)
    g_np[0:3] = np.asarray(goal)
    W_np = noise * np.eye(12)

    def f(x, u):
        pos, vel = x[0:3], x[3:6]
        att, rate = x[6:9], x[9:12]          # roll, pitch, yaw + body rates
        thrust = grav + u[0]
        phi, th = att[0], att[1]
        acc = jnp.stack([
            thrust * jnp.sin(th),
            -thrust * jnp.sin(phi) * jnp.cos(th),
            thrust * jnp.cos(phi) * jnp.cos(th) - grav,
        ])
        return jnp.concatenate([
            pos + dt * vel,
            vel + dt * acc,
            att + dt * rate,
            rate + dt * u[1:4] * 20.0,
        ])

    def c(k, x, u):
        dx = x - jnp.asarray(g_np, x.dtype)
        return 0.05 * (dx @ dx) + 0.1 * (u @ u)

    def h(x):
        dx = x - jnp.asarray(g_np, x.dtype)
        return 20.0 * (dx @ dx)

    from ratilqr_tpu.ops.tile_model import quadrotor_tile_model
    return RiskSensitiveProblem(f=f, c=c, h=h,
                                W=lambda k: jnp.asarray(W_np, dtype), N=N,
                                tile_model=quadrotor_tile_model(
                                    dt, grav, goal))


def gmm_integrator(N: int = 10, dtype=jnp.float64) -> GenerativeProblem:
    """Generative 2-D integrator with model mismatch
    (``optimal_control_problems.jl:102-116``): the solver's internal model is
    a Gaussian ``N(0, 0.5I)`` while the true simulator is the GMM
    ``0.5·N(0, 0.5I) + 0.5·N(1, I)``.  ``use_true_model`` switches between
    them (static, so each variant compiles separately)."""
    sqrt_half = 0.5 ** 0.5

    def f_stochastic(x, u, key, use_true_model=False):
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, x.shape, dtype=x.dtype)
        if use_true_model:
            pick = jax.random.bernoulli(k2, 0.5)
            w = jnp.where(pick, jnp.ones_like(x) + z, sqrt_half * z)
        else:
            w = sqrt_half * z
        return x + u + w

    return GenerativeProblem(
        f_stochastic=f_stochastic,
        c=lambda k, x, u: k / 2.0 * (x @ x) + k / 2.0 * (u @ u),
        h=lambda x: N / 2.0 * (x @ x),
        N=N,
    )
