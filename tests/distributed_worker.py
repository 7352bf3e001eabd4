"""Worker process for the real 2-process distributed test.

Launched by ``tests/test_distributed_multiprocess.py`` (one invocation per
process) — the TPU-native counterpart of the reference's spawned Julia
worker (``/root/reference/test/runtests.jl:11-13``): a genuine
multi-process run in which ``parallel.mesh.distributed_initialize``
actually executes, a *global* mesh spans both processes (4 virtual CPU
devices each → 8 total), and the sharded solver banks produce globally
sharded arrays whose values must match the single-process run bit-for-bit.

Usage:
  python distributed_worker.py <process_id> <num_processes> <port> <out.json>
"""
import json
import sys

import jax

# The axon sitecustomize hook forces jax_platforms="axon,cpu"; flip to
# genuine CPU before any backend touch (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])

    from ratilqr_tpu.parallel import distributed_initialize

    distributed_initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, PETSConfig
    from ratilqr_tpu.models import gmm_integrator, unicycle
    from ratilqr_tpu.parallel import (compute_cost_shard_map, make_mesh,
                                      make_sharded_pets_solve,
                                      make_sharded_theta_cost_fn)
    from ratilqr_tpu.solvers import pets

    dtype = jnp.float64
    mesh = make_mesh()  # global mesh over all 8 devices, both processes
    N, B = 12, 16

    def fetch(x):
        # Re-shard to fully-replicated (XLA inserts the cross-process
        # all-gather over the global mesh), then read locally.
        rep = jax.jit(lambda v: v,
                      out_shardings=NamedSharding(mesh, P()))(x)
        return np.asarray(rep)

    # 1) θ-bank: sharded CE cost evaluation across the global mesh.
    problem = unicycle(N=N, dtype=dtype)
    ce_cfg = CrossEntropyConfig(num_samples=B, ileqg=ILEQGConfig(iter_max=5))
    cost_fn = make_sharded_theta_cost_fn(problem, ce_cfg, mesh)
    thetas = jnp.linspace(1e-3, 0.05, B).astype(dtype)
    costs = cost_fn(jnp.zeros(3, dtype), jnp.zeros((N, 2), dtype), thetas,
                    jnp.asarray(0.1, dtype))
    costs_full = fetch(costs)

    # 2) PETS: fully-jitted sharded CEM solve on the global mesh.
    gen = gmm_integrator(N=N, dtype=dtype)
    pets_cfg = PETSConfig(num_control_samples=B, num_trajectory_samples=4,
                          num_elite=4, iter_max=3)
    state = pets.init_state(jnp.zeros((N, 2), dtype),
                            jnp.eye(2, dtype=dtype)[None].repeat(N, 0))
    solve_fn = make_sharded_pets_solve(gen, pets_cfg, mesh)
    out = solve_fn(jnp.zeros(2, dtype), state, jax.random.key(0))
    mu_full = fetch(out.mu)

    # 3) Explicit shard_map + collectives path.
    us = pets.sample_control_sequences(state, jax.random.key(1), B)
    c_sm = compute_cost_shard_map(gen, pets_cfg, mesh, jnp.zeros(2, dtype),
                                  us, jax.random.key(2))
    c_sm_full = fetch(c_sm)

    # 4) Seed-sharded closed-loop episode fleet across the global mesh.
    from ratilqr_tpu.mpc import make_gaussian_simulator
    from ratilqr_tpu.mpc_episode import make_ileqg_plan
    from ratilqr_tpu.parallel import make_sharded_fleet_runner
    fleet = make_sharded_fleet_runner(
        mesh, make_ileqg_plan(problem, ILEQGConfig(iter_max=5), 0.0),
        make_gaussian_simulator(problem), 3, problem.c)
    keys = jax.random.split(jax.random.key(9), 8)
    ep = fleet(jnp.zeros(3, dtype), jnp.zeros((N, 2), dtype), keys, ())
    fleet_costs_full = fetch(ep.total_cost)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({
                "process_count": jax.process_count(),
                "global_devices": n_global,
                "theta_costs": [float(v) for v in costs_full],
                "pets_mu": [[float(v) for v in row] for row in mu_full],
                "shard_map_costs": [float(v) for v in c_sm_full],
                "fleet_costs": [float(v) for v in fleet_costs_full],
            }, f)
    # All processes must reach shutdown together.
    jax.distributed.shutdown()
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()
