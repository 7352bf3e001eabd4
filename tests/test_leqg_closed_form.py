"""Closed-form Whittle LEQG pins for the θ>0 risk-sensitive Riccati math.

These tests break the oracle circularity flagged in the round-1 review:
`tests/oracle.py` and `ops/riccati.py` were written by the same reading of
``ileqg.jl:365-391`` (both factor ``M = W⁻¹ − θS``), so a shared misreading
would pass every oracle-parity test.  Here the LEQG recursion is
re-derived from Whittle's risk-sensitive LQG solution in an *algebraically
different* form that never forms M:

    S̃  = S (I − θ W S)⁻¹                    (risk-inflated cost-to-go)
    H  = R + Bᵀ S̃ B,   G = P + Bᵀ S̃ A,    L = −H⁻¹ G
    S' = Q + Aᵀ S̃ A + Lᵀ H L + Lᵀ G + Gᵀ L
    s' = s + q − (1/2θ)·logdet(I − θ W S)   [θ=0: + ½·tr(W S)]

computed with plain ``numpy.linalg`` (``inv``/``solve``/``slogdet``) — no
code shared with the solver (closed-form ``smallmat`` Cholesky) or the
oracle.  Equivalence of the two forms is a real theorem:
``S(I−θWS)⁻¹ = S + θS(W⁻¹−θS)⁻¹S`` — if the solver misread the reference
formulas, these tests fail.

The affine terms (q_vec, r, P, dl, s_vec) are pinned through a second
independent route: state augmentation ``z = (δx, 1)`` turns the affine
LEQG problem into a *pure quadratic* one with singular noise
``W̃ = diag(W, 0)`` — which the S̃-form recursion handles without ever
inverting W.  Block-extracting the augmented solution recovers
(S, s_vec, s, G, g, H, L, dl) simultaneously.

Reference formulas under test: ``/root/reference/src/ileqg.jl:365-391``
(optimizing) and ``:440-459`` (evaluating).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ratilqr_tpu.ops.approx import Approximation
from ratilqr_tpu.ops.riccati import dp_evaluate, dp_optimize

N_STEPS = 15
n, m = 3, 2


# ---------------------------------------------------------------------------
# Independent Whittle recursion (numpy only; never forms M = W⁻¹ − θS)
# ---------------------------------------------------------------------------

def whittle_step(S, theta, W):
    """Risk-inflate the cost-to-go: S̃ = S (I − θ W S)⁻¹ (symmetrized).

    Handles singular W (the augmented-state route) — only I − θWS is
    inverted.  Returns (S̃, logdet(I − θWS)) for the value constant.
    """
    IWS = np.eye(S.shape[0]) - theta * W @ S
    sign, logdet = np.linalg.slogdet(IWS)
    assert sign > 0, "infeasible (neurotic breakdown) — bad test fixture"
    S_t = S @ np.linalg.inv(IWS)
    return 0.5 * (S_t + S_t.T), logdet


def whittle_optimize(stages, terminal, theta):
    """Independent optimizing backward pass over ``stages`` (list of dicts
    with q,q_vec,Q,r,R,P,A,B,W), returning per-step results in forward
    order.  Pure quadratic-form algebra in the S̃ formulation."""
    q_T, q_vec_T, Q_T = terminal
    S, s_vec, s = Q_T, q_vec_T, q_T
    out = []
    for st in reversed(stages):
        # Augment z = (δx, 1) so the affine terms ride the quadratic
        # recursion: cost ½zᵀQ̃z + uᵀ[P r]z + ½uᵀRu, dynamics
        # z' = diag(A,1)z + [B;0]u + (w,0), noise W̃ = diag(W, 0).
        dim = S.shape[0]
        Z = np.zeros((dim, 1))
        S_aug = np.block([[S, s_vec[:, None]], [s_vec[None, :], 2 * s * np.ones((1, 1))]])
        W_aug = np.block([[st["W"], Z], [Z.T, np.zeros((1, 1))]])
        A_aug = np.block([[st["A"], Z], [Z.T, np.ones((1, 1))]])
        B_aug = np.vstack([st["B"], np.zeros((1, m))])
        P_aug = np.hstack([st["P"], st["r"][:, None]])
        Q_aug = np.block([[st["Q"], st["q_vec"][:, None]],
                          [st["q_vec"][None, :], 2 * st["q"] * np.ones((1, 1))]])

        S_t, logdet = whittle_step(S_aug, theta, W_aug)
        H = st["R"] + B_aug.T @ S_t @ B_aug
        G_aug = P_aug + B_aug.T @ S_t @ A_aug
        L_aug = -np.linalg.solve(H, G_aug)
        S_aug_new = (Q_aug + A_aug.T @ S_t @ A_aug + L_aug.T @ H @ L_aug
                     + L_aug.T @ G_aug + G_aug.T @ L_aug)
        S_aug_new = 0.5 * (S_aug_new + S_aug_new.T)

        S = S_aug_new[:dim, :dim]
        s_vec = S_aug_new[:dim, dim]
        s = 0.5 * S_aug_new[dim, dim]
        # Risk constant: θ>0 → −(1/2θ)·logdet(I−θW̃S̃_aug) (equals
        # logdet(I−θWS) — the augmentation row is unit-triangular);
        # θ=0 → ½·tr(W̃ S_aug) = ½·tr(W S).
        if theta > 0:
            s -= logdet / (2.0 * theta)
        else:
            s += 0.5 * np.trace(W_aug @ S_aug)
        out.append(dict(S=S.copy(), s_vec=s_vec.copy(), s=s,
                        H=H, G=G_aug[:, :dim], g=G_aug[:, dim],
                        L=L_aug[:, :dim], dl=L_aug[:, dim]))
    out.reverse()
    return out


def whittle_evaluate(stages, terminal, theta, L_traj, dl_traj):
    """Independent evaluating pass: substitute u = L δx + dl into cost and
    dynamics, then run pure (control-free) LEQG value iteration on the
    augmented closed-loop system — no H/G/L algebra at all."""
    q_T, q_vec_T, Q_T = terminal
    S, s_vec, s = Q_T, q_vec_T, q_T
    values = [None] * (len(stages) + 1)
    values[-1] = (S, s_vec, s)
    for t in reversed(range(len(stages))):
        st, L, dl = stages[t], L_traj[t], dl_traj[t]
        dim = S.shape[0]
        # closed-loop dynamics: δx' = (A+BL)δx + B dl + w
        A_cl = np.block([[st["A"] + st["B"] @ L, (st["B"] @ dl)[:, None]],
                         [np.zeros((1, dim)), np.ones((1, 1))]])
        # expanded cost of u = Lδx + dl:
        Q_cl = st["Q"] + L.T @ st["R"] @ L + L.T @ st["P"] + st["P"].T @ L
        qv_cl = (st["q_vec"] + st["P"].T @ dl + L.T @ st["R"] @ dl
                 + L.T @ st["r"])
        q_cl = st["q"] + st["r"] @ dl + 0.5 * dl @ st["R"] @ dl
        Q_cl_aug = np.block([[Q_cl, qv_cl[:, None]],
                             [qv_cl[None, :], 2 * q_cl * np.ones((1, 1))]])
        S_aug = np.block([[S, s_vec[:, None]],
                          [s_vec[None, :], 2 * s * np.ones((1, 1))]])
        W_aug = np.block([[st["W"], np.zeros((dim, 1))],
                          [np.zeros((1, dim)), np.zeros((1, 1))]])
        S_t, logdet = whittle_step(S_aug, theta, W_aug)
        S_aug_new = Q_cl_aug + A_cl.T @ S_t @ A_cl
        S_aug_new = 0.5 * (S_aug_new + S_aug_new.T)
        S = S_aug_new[:dim, :dim]
        s_vec = S_aug_new[:dim, dim]
        s = 0.5 * S_aug_new[dim, dim]
        if theta > 0:
            s -= logdet / (2.0 * theta)
        else:
            s += 0.5 * np.trace(st["W"] @ values[t + 1][0])
        values[t] = (S, s_vec, s)
    return values


# ---------------------------------------------------------------------------
# Fixtures: random affine LQ stage data (f64, seeded)
# ---------------------------------------------------------------------------

def _spd(rng, d, scale=1.0):
    X = rng.standard_normal((d, d))
    return scale * (X @ X.T / d + np.eye(d))


def make_stages(seed, w_scale, affine=True):
    rng = np.random.default_rng(seed)
    stages = []
    for _ in range(N_STEPS):
        stages.append(dict(
            q=float(rng.standard_normal()) if affine else 0.0,
            q_vec=(rng.standard_normal(n) if affine else np.zeros(n)),
            Q=_spd(rng, n, 0.5),
            r=(rng.standard_normal(m) if affine else np.zeros(m)),
            R=_spd(rng, m, 1.0),
            P=(0.3 * rng.standard_normal((m, n)) if affine
               else np.zeros((m, n))),
            A=0.9 * rng.standard_normal((n, n)) / np.sqrt(n),
            B=rng.standard_normal((n, m)) / np.sqrt(m),
            W=_spd(rng, n, w_scale)))
    terminal = (float(rng.standard_normal()) if affine else 0.0,
                rng.standard_normal(n) if affine else np.zeros(n),
                _spd(rng, n, 1.0))
    return stages, terminal


def to_approx(stages, terminal):
    """Pack the numpy stage data into the solver's Approximation pytree
    (W_inv/logdet_W computed with numpy — not the solver's smallmat)."""
    def stack(key):
        return jnp.asarray(np.stack([st[key] for st in stages]), jnp.float64)

    W = np.stack([st["W"] for st in stages])
    return Approximation(
        q=stack("q"), q_vec=stack("q_vec"), Q=stack("Q"), r=stack("r"),
        R=stack("R"), P=stack("P"), A=stack("A"), B=stack("B"),
        W=jnp.asarray(W, jnp.float64),
        W_inv=jnp.asarray(np.linalg.inv(W), jnp.float64),
        logdet_W=jnp.asarray(np.linalg.slogdet(W)[1], jnp.float64),
        q_term=jnp.asarray(terminal[0], jnp.float64),
        q_vec_term=jnp.asarray(terminal[1], jnp.float64),
        Q_term=jnp.asarray(terminal[2], jnp.float64))


CASES = [  # (seed, theta, w_scale)
    (0, 0.0, 0.05),
    (0, 1e-3, 0.05),
    (1, 0.02, 0.05),
    (2, 0.05, 0.02),
    (3, 0.1, 0.01),
]


@pytest.mark.parametrize("seed,theta,w_scale", CASES)
def test_dp_optimize_matches_whittle_closed_form(seed, theta, w_scale):
    stages, terminal = make_stages(seed, w_scale, affine=True)
    ref = whittle_optimize(stages, terminal, theta)
    approx = to_approx(stages, terminal)

    dp, L, dl, mu, delta, failed = dp_optimize(
        approx, theta=jnp.asarray(theta, jnp.float64),
        mu=jnp.zeros((), jnp.float64), delta=jnp.asarray(2.0, jnp.float64),
        mu_min=1e-6, delta_0=2.0)
    assert not bool(failed)
    assert float(mu) == 0.0, "fixture must not trigger a μ-restart"

    rt = dict(rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dp.S[:-1]),
                               np.stack([r["S"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dp.s_vec[:-1]),
                               np.stack([r["s_vec"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dp.s[:-1]),
                               np.asarray([r["s"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dp.H),
                               np.stack([r["H"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dp.G),
                               np.stack([r["G"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dp.g),
                               np.stack([r["g"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(L),
                               np.stack([r["L"] for r in ref]), **rt)
    np.testing.assert_allclose(np.asarray(dl),
                               np.stack([r["dl"] for r in ref]), **rt)


@pytest.mark.parametrize("seed,theta,w_scale", CASES)
def test_dp_evaluate_matches_whittle_closed_form(seed, theta, w_scale):
    # Evaluate a perturbed (suboptimal) affine policy: independent pin of
    # the fixed-L recursion (ileqg.jl:440-459) via closed-loop value
    # iteration — no H/G/L algebra shared with the solver.
    stages, terminal = make_stages(seed, w_scale, affine=True)
    rng = np.random.default_rng(seed + 100)
    opt = whittle_optimize(stages, terminal, theta)
    L_traj = np.stack([r["L"] for r in opt]) + \
        0.1 * rng.standard_normal((N_STEPS, m, n))
    dl_traj = np.stack([r["dl"] for r in opt]) + \
        0.1 * rng.standard_normal((N_STEPS, m))
    ref_vals = whittle_evaluate(stages, terminal, theta, L_traj, dl_traj)
    approx = to_approx(stages, terminal)

    dp, failed = dp_evaluate(
        approx, jnp.asarray(L_traj, jnp.float64),
        jnp.asarray(dl_traj, jnp.float64),
        theta=jnp.asarray(theta, jnp.float64), mu=jnp.zeros((), jnp.float64))
    assert not bool(failed)

    rt = dict(rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dp.S[:-1]),
                               np.stack([v[0] for v in ref_vals[:-1]]), **rt)
    np.testing.assert_allclose(np.asarray(dp.s_vec[:-1]),
                               np.stack([v[1] for v in ref_vals[:-1]]), **rt)
    np.testing.assert_allclose(np.asarray(dp.s[:-1]),
                               np.asarray([v[2] for v in ref_vals[:-1]]), **rt)


def test_whittle_suboptimal_policy_costs_more():
    # Internal consistency of the *independent* recursion itself: the
    # optimal policy's value must lower-bound any perturbed policy's value
    # (checks the test's own algebra, not the solver).
    stages, terminal = make_stages(4, 0.05, affine=True)
    theta = 0.02
    opt = whittle_optimize(stages, terminal, theta)
    L_t = np.stack([r["L"] for r in opt])
    dl_t = np.stack([r["dl"] for r in opt])
    v_opt = whittle_evaluate(stages, terminal, theta, L_t, dl_t)[0]
    np.testing.assert_allclose(v_opt[2], opt[0]["s"], rtol=1e-8)
    rng = np.random.default_rng(7)
    v_sub = whittle_evaluate(
        stages, terminal, theta,
        L_t + 0.2 * rng.standard_normal(L_t.shape),
        dl_t + 0.2 * rng.standard_normal(dl_t.shape))[0]
    # compare value at a test state x: ½xᵀSx + s_vecᵀx + s
    x = rng.standard_normal(n)
    val = lambda v: 0.5 * x @ v[0] @ x + v[1] @ x + v[2]
    assert val(v_sub) > val(v_opt)
