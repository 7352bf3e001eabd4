"""Multi-device sharding tests on the 8-virtual-CPU-device mesh — the
analogue of the reference's distributed tests on a spawned worker
(``test/runtests.jl:11-13``, SURVEY.md §4 implication (c)).

The invariant throughout: sharded execution ≡ single-device execution
(placement changes, math doesn't) — replacing the reference's
parallel ≡ serial assertions."""
import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, PETSConfig
from ratilqr_tpu.models import nonlinear_toy
from ratilqr_tpu.parallel import (compute_cost_shard_map, make_mesh,
                                  make_sharded_pets_solve,
                                  make_sharded_theta_cost_fn)
from ratilqr_tpu.solvers import pets, ratilqr
from ratilqr_tpu.tests_support import pets_uniform_problem  # noqa: F401


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["samples"] == 8


def test_sharded_theta_bank_matches_unsharded():
    # Sharded CE θ-bank ≡ unsharded bank, lane for lane (the reference's
    # compute_cost ≈ compute_cost_serial test, ce test :29-32).
    prob = nonlinear_toy(N=10)
    config = CrossEntropyConfig(num_samples=8)
    x0 = jnp.zeros(2, jnp.float64)
    u0 = 0.1 * jnp.ones((10, 2), jnp.float64)
    thetas = jnp.linspace(0.05, 0.6, 8)

    mesh = make_mesh()
    sharded = make_sharded_theta_cost_fn(prob, config, mesh)
    plain = ratilqr.make_cost_fn(prob, config)
    c_sharded = sharded(x0, u0, thetas, 1.0)
    c_plain = plain(x0, u0, thetas, 1.0)
    np.testing.assert_allclose(np.asarray(c_sharded), np.asarray(c_plain),
                               rtol=1e-10)


def test_sharded_theta_bank_masks_nonfinite_lanes():
    """Sharded ≡ unsharded INCLUDING non-finite lanes (VERDICT r3 item 3):
    neurotic-breakdown lanes surface as Inf and NaN-objective lanes are
    masked to Inf identically in both paths — the Inf-masking contract the
    reference pins at cross_entropy_bilevel_optimization.jl:161-166."""
    from ratilqr_tpu.problems import RiskSensitiveProblem

    # Large noise covariance: M = W⁻¹ − θS loses PSD at moderate θ, so the
    # large-θ lanes are neurotic breakdowns (failed → Inf) while the tiny-θ
    # lanes stay feasible.
    prob = RiskSensitiveProblem(
        f=lambda x, u: x + u,
        c=lambda k, x, u: x @ x + u @ u,
        h=lambda x: x @ x,
        W=lambda k: 1e3 * jnp.eye(2, dtype=jnp.float64),
        N=6)
    config = CrossEntropyConfig(num_samples=8, ileqg=ILEQGConfig(iter_max=3))
    x0 = jnp.ones(2, jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    thetas = jnp.concatenate([jnp.linspace(1e-6, 1e-4, 4),
                              jnp.linspace(1.0, 100.0, 4)])
    mesh = make_mesh()
    c_sharded = np.asarray(
        make_sharded_theta_cost_fn(prob, config, mesh)(x0, u0, thetas, 1.0))
    c_plain = np.asarray(
        ratilqr.make_cost_fn(prob, config)(x0, u0, thetas, 1.0))
    assert np.any(np.isinf(c_plain)), "fixture must have breakdown lanes"
    assert np.any(np.isfinite(c_plain)), "fixture must have feasible lanes"
    assert not np.any(np.isnan(c_sharded))
    np.testing.assert_array_equal(np.isinf(c_sharded), np.isinf(c_plain))
    finite = np.isfinite(c_plain)
    np.testing.assert_allclose(c_sharded[finite], c_plain[finite],
                               rtol=1e-10)

    # NaN-objective lanes (NaN dynamics; no failure flag fires) must mask
    # to Inf in BOTH paths — unmasked NaN sorts FIRST under top_k(-c) and
    # poisons the elite refit.
    nan_prob = RiskSensitiveProblem(
        f=lambda x, u: jnp.sqrt(x - 100.0) + u,   # sqrt of negative: NaN
        c=lambda k, x, u: x @ x + u @ u,
        h=lambda x: x @ x,
        W=lambda k: 0.1 * jnp.eye(2, dtype=jnp.float64),
        N=6)
    th2 = jnp.linspace(0.01, 0.1, 8)
    cn_sharded = np.asarray(make_sharded_theta_cost_fn(
        nan_prob, config, mesh)(jnp.zeros(2, jnp.float64), u0, th2, 1.0))
    cn_plain = np.asarray(ratilqr.make_cost_fn(nan_prob, config)(
        jnp.zeros(2, jnp.float64), u0, th2, 1.0))
    assert np.all(np.isinf(cn_sharded)) and np.all(np.isinf(cn_plain))


def test_shard_map_pets_cost_shapes_and_determinism(pets_uniform_problem):
    prob = pets_uniform_problem
    config = PETSConfig(num_control_samples=16, num_trajectory_samples=3)
    mesh = make_mesh()
    x0 = jnp.zeros(2, jnp.float64)
    us = jax.random.normal(jax.random.key(0), (16, prob.N, 2),
                           dtype=jnp.float64)
    key = jax.random.key(1)
    c1 = compute_cost_shard_map(prob, config, mesh, x0, us, key)
    c2 = compute_cost_shard_map(prob, config, mesh, x0, us, key)
    assert c1.shape == (16,)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert np.all(np.isfinite(np.asarray(c1)))
    # Cost-only-on-u problem: exact independent recomputation per sequence.
    expected = np.asarray(jnp.sum(jnp.abs(us), axis=(1, 2)) + 1.0)
    np.testing.assert_allclose(np.asarray(c1), expected, rtol=1e-12)


def test_sharded_pets_solve_matches_unsharded(pets_uniform_problem):
    # Same keys → the GSPMD-sharded solve must reproduce the single-device
    # solve bit-for-bit in structure (same sampling, same elites).
    prob = pets_uniform_problem
    config = PETSConfig(num_control_samples=16, num_trajectory_samples=4,
                        num_elite=4, iter_max=3)
    x0 = jnp.zeros(2, jnp.float64)
    mu = jnp.zeros((prob.N, 2), jnp.float64)
    sigma = jnp.eye(2, dtype=jnp.float64)[None].repeat(prob.N, 0)
    state = pets.init_state(mu, sigma)
    key = jax.random.key(42)

    mesh = make_mesh()
    sharded_solve = make_sharded_pets_solve(prob, config, mesh)
    out_sharded = sharded_solve(x0, state, key)
    out_plain = pets.solve(prob, config, x0, state, key)
    np.testing.assert_allclose(np.asarray(out_sharded.mu),
                               np.asarray(out_plain.mu), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_sharded.sigma),
                               np.asarray(out_plain.sigma), rtol=1e-12)


def test_shard_map_rejects_indivisible_batch(pets_uniform_problem):
    prob = pets_uniform_problem
    config = PETSConfig(num_control_samples=10)
    mesh = make_mesh()
    us = jnp.zeros((10, prob.N, 2))
    try:
        compute_cost_shard_map(prob, config, mesh, jnp.zeros(2), us,
                               jax.random.key(0))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_sharded_elite_selection_matches_global_topk(pets_uniform_problem):
    # Per-shard top-k + merged top-k must equal the global top-k exactly
    # (the global elite set is always a subset of the union of per-shard
    # elite sets; costs are continuous -> distinct a.s.).
    from ratilqr_tpu.parallel import sharded_elite_selection

    mesh = make_mesh()
    K, N, m, ne = 64, 5, 2, 7
    key = jax.random.key(9)
    us = jax.random.normal(key, (K, N, m), jnp.float64)
    costs = jax.random.normal(jax.random.fold_in(key, 1), (K,), jnp.float64)
    elites = sharded_elite_selection(mesh, us, costs, ne)
    ref, _ = pets.get_elite_samples(us, costs, ne)
    np.testing.assert_array_equal(np.asarray(elites), np.asarray(ref))


def test_sharded_pets_solve_shard_elites_matches(pets_uniform_problem):
    # The communication-optimal elite path is a pure placement change:
    # identical solve results to the all-gather path and the plain solve.
    prob = pets_uniform_problem
    config = PETSConfig(num_control_samples=16, num_trajectory_samples=4,
                        num_elite=4, iter_max=3)
    x0 = jnp.zeros(2, jnp.float64)
    state = pets.init_state(
        jnp.zeros((prob.N, 2), jnp.float64),
        jnp.eye(2, dtype=jnp.float64)[None].repeat(prob.N, 0))
    key = jax.random.key(42)
    mesh = make_mesh()
    out_opt = make_sharded_pets_solve(prob, config, mesh,
                                      shard_elites=True)(x0, state, key)
    out_plain = pets.solve(prob, config, x0, state, key)
    np.testing.assert_allclose(np.asarray(out_opt.mu),
                               np.asarray(out_plain.mu), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_opt.sigma),
                               np.asarray(out_plain.sigma), rtol=1e-12)


def test_sharded_fleet_matches_unsharded():
    # Seed-sharded episode fleet ≡ unsharded fleet (placement only).
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.models import lqr_problem
    from ratilqr_tpu.mpc_episode import (make_fleet_runner,
                                         make_gaussian_simulator,
                                         make_ileqg_plan)
    from ratilqr_tpu.parallel import make_sharded_fleet_runner

    prob = lqr_problem(N=6, noise=1e-3)
    cfg = ILEQGConfig(iter_max=15)
    x0 = jnp.array([1.0, -1.0], jnp.float64)
    u0 = jnp.zeros((6, 2), jnp.float64)
    keys = jax.random.split(jax.random.key(9), 8)
    args = (make_ileqg_plan(prob, cfg, 0.0),
            make_gaussian_simulator(prob), 4, prob.c)

    mesh = make_mesh()
    sharded = make_sharded_fleet_runner(mesh, *args)(x0, u0, keys, ())
    plain = make_fleet_runner(*args)(x0, u0, keys, ())
    np.testing.assert_allclose(np.asarray(sharded.xs),
                               np.asarray(plain.xs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.total_cost),
                               np.asarray(plain.total_cost), rtol=1e-12)
    # The sharded output really is distributed over the mesh.
    assert len(sharded.total_cost.sharding.device_set) == 8


def test_sharded_fleet_rejects_indivisible_keys():
    from ratilqr_tpu import ILEQGConfig
    from ratilqr_tpu.models import lqr_problem
    from ratilqr_tpu.mpc_episode import (make_gaussian_simulator,
                                         make_ileqg_plan)
    from ratilqr_tpu.parallel import make_sharded_fleet_runner

    import pytest
    prob = lqr_problem(N=4, noise=1e-3)
    fleet = make_sharded_fleet_runner(
        make_mesh(), make_ileqg_plan(prob, ILEQGConfig(iter_max=3), 0.0),
        make_gaussian_simulator(prob), 2, prob.c)
    keys = jax.random.split(jax.random.key(0), 6)  # 6 % 8 != 0
    with pytest.raises(ValueError, match="divide evenly"):
        fleet(jnp.zeros(2, jnp.float64), jnp.zeros((4, 2), jnp.float64),
              keys, ())
