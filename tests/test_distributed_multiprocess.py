"""Real 2-process distributed test (the reference's spawned-worker analogue).

The reference exercises its distributed path with an actually-spawned
worker process (``/root/reference/test/runtests.jl:11-13``).  This is the
honest counterpart for the JAX backend: two OS processes each holding 4
virtual CPU devices, joined by ``jax.distributed.initialize`` into one
8-device **global** mesh, running the sharded θ-bank / PETS paths — and the
gathered results must equal the single-process 8-device run exactly
(sharding changes placement, not math; same PRNG keys → same draws).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multiprocess_results(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist") / "result.json")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-u", WORKER, str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{o}"
    with open(out) as f:
        return json.load(f)


def _single_process_reference():
    """Same workload on this process's own 8 virtual devices."""
    from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, PETSConfig
    from ratilqr_tpu.models import gmm_integrator, unicycle
    from ratilqr_tpu.parallel import (compute_cost_shard_map, make_mesh,
                                      make_sharded_pets_solve,
                                      make_sharded_theta_cost_fn)
    from ratilqr_tpu.solvers import pets

    dtype = jnp.float64
    mesh = make_mesh()
    N, B = 12, 16
    problem = unicycle(N=N, dtype=dtype)
    ce_cfg = CrossEntropyConfig(num_samples=B, ileqg=ILEQGConfig(iter_max=5))
    cost_fn = make_sharded_theta_cost_fn(problem, ce_cfg, mesh)
    thetas = jnp.linspace(1e-3, 0.05, B).astype(dtype)
    costs = np.asarray(cost_fn(jnp.zeros(3, dtype), jnp.zeros((N, 2), dtype),
                               thetas, jnp.asarray(0.1, dtype)))

    gen = gmm_integrator(N=N, dtype=dtype)
    pets_cfg = PETSConfig(num_control_samples=B, num_trajectory_samples=4,
                          num_elite=4, iter_max=3)
    state = pets.init_state(jnp.zeros((N, 2), dtype),
                            jnp.eye(2, dtype=dtype)[None].repeat(N, 0))
    solve_fn = make_sharded_pets_solve(gen, pets_cfg, mesh)
    mu = np.asarray(solve_fn(jnp.zeros(2, dtype), state,
                             jax.random.key(0)).mu)

    us = pets.sample_control_sequences(state, jax.random.key(1), B)
    c_sm = np.asarray(compute_cost_shard_map(
        gen, pets_cfg, mesh, jnp.zeros(2, dtype), us, jax.random.key(2)))

    from ratilqr_tpu.mpc import make_gaussian_simulator
    from ratilqr_tpu.mpc_episode import make_ileqg_plan
    from ratilqr_tpu.parallel import make_sharded_fleet_runner
    fleet = make_sharded_fleet_runner(
        mesh, make_ileqg_plan(problem, ILEQGConfig(iter_max=5), 0.0),
        make_gaussian_simulator(problem), 3, problem.c)
    keys = jax.random.split(jax.random.key(9), 8)
    fleet_costs = np.asarray(fleet(jnp.zeros(3, dtype),
                                   jnp.zeros((N, 2), dtype), keys,
                                   ()).total_cost)
    return costs, mu, c_sm, fleet_costs


def test_two_process_global_mesh(multiprocess_results):
    res = multiprocess_results
    assert res["process_count"] == 2
    assert res["global_devices"] == 8


def test_two_process_matches_single_process(multiprocess_results):
    res = multiprocess_results
    costs, mu, c_sm, fleet_costs = _single_process_reference()
    np.testing.assert_allclose(np.asarray(res["theta_costs"]), costs,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res["pets_mu"]), mu, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res["shard_map_costs"]), c_sm,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res["fleet_costs"]), fleet_costs,
                               rtol=1e-12)
