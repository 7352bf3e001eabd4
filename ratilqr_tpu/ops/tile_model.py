"""Tile-model protocol: closed-form model callbacks for in-kernel tracing.

The fused line-search candidate kernel (``ops/candidate_pallas.py``) runs
the rollout + quadratization INSIDE a Mosaic program, where the state is a
``(n, 8, 128)`` lane-tile stack rather than an ``(n,)`` vector and no AD
is available.  A :class:`TileModel` supplies the three closed-form pieces
the kernel needs, written against *component-indexed elementwise* ops only
(``x[0]``, ``+``, ``*``, ``jnp.sin`` — anything that maps a scalar formula
over an ``(8, 128)`` tile; matrix ops like ``@`` are out).  The formulas
must equal what the XLA path derives by AD from ``problem.f``/``c``/``h``
(``ops/approx.approximate_model``) — equality is pinned by
``tests/test_candidate_fused.py``.

This is the first cut of the "user callbacks traced into the kernel"
obligation (round-4 VERDICT item 1): models opt in by attaching a
``tile_model`` to their :class:`~ratilqr_tpu.problems.RiskSensitiveProblem`
(the example models do, ``models/examples.py``); problems without one
transparently keep the XLA candidate path.

Shapes inside the kernel (lane tile = one (8, 128) f32 VPU register):
  - state ``x``: ``(n, 8, 128)``; control ``u``: ``(m, 8, 128)``.
  - matrices: ``(p, q, 8, 128)`` blocks, elementwise over the lane tile.
  - time index ``k``: traced i32 scalar (cast before mixing with floats).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

Array = jnp.ndarray


def mat(rows):
    """Build a (p, q, 8, 128) block from a nested list of (8, 128) tiles."""
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def const_mat(np_mat, like: Array) -> Array:
    """Lift a constant numpy matrix to a (p, q, 8, 128) block."""
    return mat([[jnp.full_like(like, float(v)) for v in row]
                for row in np_mat])


@dataclasses.dataclass(frozen=True)
class TileModel:
    """Closed-form model pieces for in-kernel rollout + quadratization.

    Attributes:
      f_jac_tile: ``(x, u) -> (x_next, A, B)`` — dynamics step + Jacobians
        ``A = dx'/dx (n, n, ·)``, ``B = dx'/du (n, m, ·)``.  Must equal the
        problem's ``f``/``f_jac`` (or AD of ``f``) formulas.
      quad_tile: ``(k, x, u) -> (q, q_vec, Q, r, R, P)`` — stage cost and
        its exact first/second derivatives (``q (·)``, ``q_vec (n, ·)``,
        ``Q (n, n, ·)``, ``r (m, ·)``, ``R (m, m, ·)``, ``P = c_ux
        (m, n, ·)``).  ``k`` is the traced time index (i32 scalar).
      term_tile: ``(x) -> (q, q_vec, Q)`` — terminal cost ``h`` and
        derivatives.
    """
    f_jac_tile: Callable
    quad_tile: Callable
    term_tile: Callable


# --- tile models for the example problems (models/examples.py) -----------

def unicycle_tile_model(dt: float, goal) -> TileModel:
    """Tile model for :func:`ratilqr_tpu.models.unicycle` — same formulas
    as its ``f``/``f_jac``/``c``/``h`` (cost is quadratic, so the
    closed-form derivatives equal the XLA path's AD exactly)."""
    gx, gy = float(goal[0]), float(goal[1])

    def f_jac_tile(x, u):
        px, py, th = x[0], x[1], x[2]
        v, om = u[0], u[1]
        s, co = jnp.sin(th), jnp.cos(th)
        one = jnp.ones_like(th)
        zero = jnp.zeros_like(th)
        x_next = jnp.stack([px + dt * v * co, py + dt * v * s,
                            th + dt * om])
        A = mat([[one, zero, -dt * v * s],
                 [zero, one, dt * v * co],
                 [zero, zero, one]])
        B = mat([[dt * co, zero],
                 [dt * s, zero],
                 [zero, dt * one]])
        return x_next, A, B

    def quad_tile(k, x, u):
        del k
        dx = jnp.stack([x[0] - gx, x[1] - gy, x[2]])
        q = 0.05 * (dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]) \
            + 0.05 * (u[0] * u[0] + u[1] * u[1])
        q_vec = 0.1 * dx
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        Q = mat([[0.1 * one, zero, zero],
                 [zero, 0.1 * one, zero],
                 [zero, zero, 0.1 * one]])
        r = 0.1 * u
        R = mat([[0.1 * one, zero], [zero, 0.1 * one]])
        P = mat([[zero, zero, zero], [zero, zero, zero]])
        return q, q_vec, Q, r, R, P

    def term_tile(x):
        dx = jnp.stack([x[0] - gx, x[1] - gy, x[2]])
        q = 10.0 * (dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2])
        q_vec = 20.0 * dx
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        Q = mat([[20.0 * one, zero, zero],
                 [zero, 20.0 * one, zero],
                 [zero, zero, 20.0 * one]])
        return q, q_vec, Q

    return TileModel(f_jac_tile=f_jac_tile, quad_tile=quad_tile,
                     term_tile=term_tile)


def cartpole_tile_model(dt: float, mc: float, mp: float, lp: float,
                        grav: float) -> TileModel:
    """Tile model for :func:`ratilqr_tpu.models.cartpole` (n=4, m=1) —
    closed-form Jacobians of the φ-from-upright cart-pole dynamics
    (quotient-rule expansion of ``phi_acc = N(φ)/D(φ)``); equality with
    ``jax.jacfwd`` of the problem's ``f`` is pinned by
    ``tests/test_candidate_fused.py``."""
    M = mc + mp
    k1 = mp * lp / M

    def f_jac_tile(x, u):
        pos, vel, phi, om = x[0], x[1], x[2], x[3]
        force = u[0]
        s, c = jnp.sin(phi), jnp.cos(phi)
        one = jnp.ones_like(phi)
        zero = jnp.zeros_like(phi)

        temp = (force + mp * lp * om * om * s) / M
        D = lp * (4.0 / 3.0 - mp * c * c / M)
        N = grav * s - c * temp
        phi_acc = N / D
        acc = temp - k1 * phi_acc * c
        x_next = jnp.stack([pos + dt * vel, vel + dt * acc,
                            phi + dt * om, om + dt * phi_acc])

        dtemp_dphi = k1 * om * om * c
        dtemp_dom = 2.0 * k1 * om * s
        dtemp_dF = one / M
        dN_dphi = grav * c + s * temp - c * dtemp_dphi
        dD_dphi = 2.0 * lp * mp * c * s / M
        dpa_dphi = (dN_dphi * D - N * dD_dphi) / (D * D)
        dpa_dom = -c * dtemp_dom / D
        dpa_dF = -c * dtemp_dF / D
        dacc_dphi = dtemp_dphi - k1 * (dpa_dphi * c - phi_acc * s)
        dacc_dom = dtemp_dom - k1 * c * dpa_dom
        dacc_dF = dtemp_dF - k1 * c * dpa_dF

        A = mat([[one, dt * one, zero, zero],
                 [zero, one, dt * dacc_dphi, dt * dacc_dom],
                 [zero, zero, one, dt * one],
                 [zero, zero, dt * dpa_dphi, one + dt * dpa_dom]])
        B = mat([[zero], [dt * dacc_dF], [zero], [dt * dpa_dF]])
        return x_next, A, B

    def quad_tile(k, x, u):
        del k
        q = 0.1 * (x[0] * x[0] + x[1] * x[1] + 10.0 * x[2] * x[2]
                   + x[3] * x[3]) + 0.05 * u[0] * u[0]
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([0.2 * x[0], 0.2 * x[1], 2.0 * x[2],
                           0.2 * x[3]])
        Q = mat([[0.2 * one, zero, zero, zero],
                 [zero, 0.2 * one, zero, zero],
                 [zero, zero, 2.0 * one, zero],
                 [zero, zero, zero, 0.2 * one]])
        r = jnp.stack([0.1 * u[0]])
        R = mat([[0.1 * one]])
        P = mat([[zero, zero, zero, zero]])
        return q, q_vec, Q, r, R, P

    def term_tile(x):
        q = 10.0 * (x[0] * x[0] + x[1] * x[1] + 10.0 * x[2] * x[2]
                    + x[3] * x[3])
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([20.0 * x[0], 20.0 * x[1], 200.0 * x[2],
                           20.0 * x[3]])
        Q = mat([[20.0 * one, zero, zero, zero],
                 [zero, 20.0 * one, zero, zero],
                 [zero, zero, 200.0 * one, zero],
                 [zero, zero, zero, 20.0 * one]])
        return q, q_vec, Q

    return TileModel(f_jac_tile=f_jac_tile, quad_tile=quad_tile,
                     term_tile=term_tile)


def quadrotor_tile_model(dt: float, grav: float, goal) -> TileModel:
    """Tile model for :func:`ratilqr_tpu.models.quadrotor` (n=12, m=4) —
    hand-derived Jacobians of the small-angle quadrotor: only the
    acceleration block (thrust through roll/pitch trig) is nonlinear;
    everything else is integrator structure.  Equality with AD of the
    problem's ``f``/``c``/``h`` is pinned by
    ``tests/test_candidate_fused.py``.

    The 123 MB folded candidate stack puts n=12 far outside the
    candidate kernel's VMEM budget at T=100, but the fused STEP kernel
    (``ops/step_pallas.py``) stores only the trajectory and recomputes
    these formulas per backward step — (12+4)-float residency/step, so
    the quadrotor rides it at full horizon.
    """
    g0, g1, g2 = float(goal[0]), float(goal[1]), float(goal[2])
    goals = [g0, g1, g2] + [0.0] * 9

    def f_jac_tile(x, u):
        phi, th = x[6], x[7]
        one = jnp.ones_like(phi)
        zero = jnp.zeros_like(phi)
        sph, cph = jnp.sin(phi), jnp.cos(phi)
        sth, cth = jnp.sin(th), jnp.cos(th)
        thrust = grav + u[0]

        acc = [thrust * sth, -thrust * sph * cth,
               thrust * cph * cth - grav]
        x_next = jnp.stack([
            x[0] + dt * x[3], x[1] + dt * x[4], x[2] + dt * x[5],
            x[3] + dt * acc[0], x[4] + dt * acc[1], x[5] + dt * acc[2],
            x[6] + dt * x[9], x[7] + dt * x[10], x[8] + dt * x[11],
            x[9] + dt * 20.0 * u[1], x[10] + dt * 20.0 * u[2],
            x[11] + dt * 20.0 * u[3]])

        A_rows = [[one if i == j else zero for j in range(12)]
                  for i in range(12)]
        for i in range(3):                     # pos ← vel, att ← rate
            A_rows[i][3 + i] = dt * one
            A_rows[6 + i][9 + i] = dt * one
        # ∂acc/∂(φ, θ):  acc = T·(sinθ, −sinφ cosθ, cosφ cosθ) − (0,0,g)
        A_rows[3][7] = dt * thrust * cth
        A_rows[4][6] = -dt * thrust * cph * cth
        A_rows[4][7] = dt * thrust * sph * sth
        A_rows[5][6] = -dt * thrust * sph * cth
        A_rows[5][7] = -dt * thrust * cph * sth
        A = mat(A_rows)

        B_rows = [[zero] * 4 for _ in range(12)]
        B_rows[3][0] = dt * sth                # ∂acc/∂u₀ = acc dir
        B_rows[4][0] = -dt * sph * cth
        B_rows[5][0] = dt * cph * cth
        for i in range(3):                     # rate ← 20·torque
            B_rows[9 + i][1 + i] = dt * 20.0 * one
        B = mat(B_rows)
        return x_next, A, B

    def quad_tile(k, x, u):
        del k
        dx = jnp.stack([x[i] - goals[i] for i in range(12)])
        q = (0.05 * sum(dx[i] * dx[i] for i in range(12))
             + 0.1 * sum(u[j] * u[j] for j in range(4)))
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = 0.1 * dx
        Q = mat([[0.1 * one if i == j else zero for j in range(12)]
                 for i in range(12)])
        r = 0.2 * u
        R = mat([[0.2 * one if i == j else zero for j in range(4)]
                 for i in range(4)])
        P = mat([[zero] * 12 for _ in range(4)])
        return q, q_vec, Q, r, R, P

    def term_tile(x):
        dx = jnp.stack([x[i] - goals[i] for i in range(12)])
        q = 20.0 * sum(dx[i] * dx[i] for i in range(12))
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = 40.0 * dx
        Q = mat([[40.0 * one if i == j else zero for j in range(12)]
                 for i in range(12)])
        return q, q_vec, Q

    return TileModel(f_jac_tile=f_jac_tile, quad_tile=quad_tile,
                     term_tile=term_tile)


def lqr_tile_model() -> TileModel:
    """Tile model for :func:`ratilqr_tpu.models.lqr_problem`
    (``f = x + u``, ``c = 0.5 x·x + u·u``, ``h = 0.5 x·x``)."""

    def f_jac_tile(x, u):
        one = jnp.ones_like(x[0])
        zero = jnp.zeros_like(x[0])
        x_next = jnp.stack([x[0] + u[0], x[1] + u[1]])
        A = mat([[one, zero], [zero, one]])
        B = mat([[one, zero], [zero, one]])
        return x_next, A, B

    def quad_tile(k, x, u):
        del k
        q = 0.5 * (x[0] * x[0] + x[1] * x[1]) + (u[0] * u[0] + u[1] * u[1])
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([x[0], x[1]])
        Q = mat([[one, zero], [zero, one]])
        r = 2.0 * u
        R = mat([[2.0 * one, zero], [zero, 2.0 * one]])
        P = mat([[zero, zero], [zero, zero]])
        return q, q_vec, Q, r, R, P

    def term_tile(x):
        q = 0.5 * (x[0] * x[0] + x[1] * x[1])
        one = jnp.ones_like(q)
        zero = jnp.zeros_like(q)
        q_vec = jnp.stack([x[0], x[1]])
        Q = mat([[one, zero], [zero, one]])
        return q, q_vec, Q

    return TileModel(f_jac_tile=f_jac_tile, quad_tile=quad_tile,
                     term_tile=term_tile)
