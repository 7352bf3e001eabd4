"""Multi-host scaling benchmark — the instrument, shipped ahead of hardware.

BASELINE.json north star: >=80% linear scaling of the PETS/CE sample
sharding to 2+ hosts.  This environment exposes ONE tunneled TPU chip, so
the scaling row cannot be filled here — but the measurement must not wait
for the pod slice to be *written*.  This script is runnable today on a
multi-process CPU mesh (CI smoke: ``tests/test_multihost_bench.py``) and
on a real pod slice UNCHANGED:

Single host (baseline; also what CI smokes)::

    python benchmarks/multihost.py --out /tmp/mh_1host.json

Per host on an N-host pod slice (the reference's ``addprocs`` analogue,
``/root/reference/test/runtests.jl:11-13``; fan-out being replaced:
``/root/reference/src/pets.jl:100-126``)::

    python benchmarks/multihost.py \
        --coordinator host0:8476 --num-processes N --process-id $ID \
        --baseline /tmp/mh_1host.json --out multihost.json

Process 0 writes ``--out`` with global + per-host rates for the three
sharded workloads (PETS CEM generations, CE θ-bank, seed-sharded episode
fleet) plus the elite-selection collective time; with ``--baseline`` it
also records strong-scaling efficiency
``rate_multi / (num_processes × rate_baseline)`` per workload —
the number the BASELINE.md scaling row wants (≥0.8).

Workload sizes are GLOBAL and must divide the global device count; for an
honest strong-scaling efficiency use the same sizes in the baseline and
the multi-host run, sized large enough that per-dispatch overhead doesn't
dominate (defaults target a pod slice; CI shrinks them).

Timing is fetch-synced (``block_until_ready`` is a no-op on the tunneled
axon runtime — utils/profiling.sync) after re-replicating the output over
the global mesh, so every rep includes the cross-host collective it will
cost in production to read a result.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (multi-process runs)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu); default: auto")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N virtual CPU devices per process "
                         "(sets XLA_FLAGS; implies --platform cpu)")
    ap.add_argument("--pets-samples", type=int, default=4096,
                    help="global K: CEM control samples per generation")
    ap.add_argument("--pets-traj", type=int, default=16,
                    help="M: MC rollouts per control sample")
    ap.add_argument("--theta-bank", type=int, default=2048,
                    help="global B: θ-samples per CE cost evaluation")
    ap.add_argument("--fleet-episodes", type=int, default=64,
                    help="global seed count for the episode fleet")
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--ileqg-iters", type=int, default=30,
                    help="iLEQG iter_max for the θ-bank/fleet workloads")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--baseline", default=None,
                    help="JSON from a single-host run of the SAME sizes; "
                         "adds scaling_efficiency keys")
    ap.add_argument("--out", default=None,
                    help="output JSON path (written by process 0)")
    return ap.parse_args(argv)


def run(args) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if args.coordinator:
        from ratilqr_tpu.parallel import distributed_initialize
        distributed_initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    from ratilqr_tpu import (CrossEntropyConfig, ILEQGConfig, PETSConfig)
    from ratilqr_tpu.models import gmm_integrator, unicycle
    from ratilqr_tpu.mpc import make_gaussian_simulator
    from ratilqr_tpu.mpc_episode import make_ileqg_plan
    from ratilqr_tpu.parallel import (make_mesh, make_sharded_fleet_runner,
                                      make_sharded_pets_solve,
                                      make_sharded_theta_cost_fn,
                                      sharded_elite_selection)
    from ratilqr_tpu.solvers import pets

    mesh = make_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))
    dtype = jnp.float32

    rep_sharding = NamedSharding(mesh, P())
    replicate = jax.jit(lambda v: v, out_shardings=rep_sharding)

    def timed(fn, *fargs, reps=args.reps):
        """Best-of-reps seconds; each rep fetch-syncs through a global
        re-replication (includes the cross-host result collective)."""
        out = replicate(fn(*fargs))          # warmup/compile
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = replicate(fn(*fargs))
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    record = {
        "process_count": jax.process_count(),
        "process_id": jax.process_index(),
        "global_devices": n_dev,
        "local_devices": len(jax.local_devices()),
        "platform": jax.devices()[0].platform,
        "sizes": {"pets_samples": args.pets_samples,
                  "pets_traj": args.pets_traj,
                  "theta_bank": args.theta_bank,
                  "fleet_episodes": args.fleet_episodes,
                  "horizon": args.horizon},
    }

    # --- 1) PETS CEM generations, control-sample axis sharded -----------
    # Per-generation time via iter_max differencing (G=1 vs G=1+dG in one
    # jitted solve each) so per-solve fixed costs and the dispatch round
    # trip cancel — same protocol as benchmarks/pets_roofline.py.
    N, K, M = args.horizon, args.pets_samples, args.pets_traj
    gen_prob = gmm_integrator(N=N, dtype=dtype)
    dG = 4

    def pets_cfg(iters):
        return PETSConfig(num_control_samples=K, num_trajectory_samples=M,
                          num_elite=max(2, K // 8), iter_max=iters)

    solve_g1 = make_sharded_pets_solve(gen_prob, pets_cfg(1), mesh,
                                       shard_elites=True)
    solve_g2 = make_sharded_pets_solve(gen_prob, pets_cfg(1 + dG), mesh,
                                       shard_elites=True)
    x0g = jnp.zeros(2, dtype)
    st = pets.init_state(jnp.zeros((N, 2), dtype),
                         jnp.eye(2, dtype=dtype)[None].repeat(N, 0))
    key = jax.random.key(0)
    t1 = timed(lambda: solve_g1(x0g, st, key))
    t2 = timed(lambda: solve_g2(x0g, st, key))
    per_gen = max((t2 - t1) / dG, 1e-9)
    record["pets_rollouts_per_s"] = K * M / per_gen
    record["pets_rollouts_per_s_per_host"] = (
        K * M / per_gen / jax.process_count())
    record["pets_gen_s"] = per_gen

    # --- 2) CE θ-bank cost evaluation, θ axis sharded -------------------
    B = args.theta_bank
    rs_prob = unicycle(N=N, dtype=dtype)
    ce_cfg = CrossEntropyConfig(
        num_samples=B,
        ileqg=ILEQGConfig(iter_max=args.ileqg_iters, scan_unroll=4))
    cost_fn = make_sharded_theta_cost_fn(rs_prob, ce_cfg, mesh)
    thetas = jnp.linspace(1e-4, 0.02, B).astype(dtype)
    x0u = jnp.zeros(3, dtype)
    u0 = jnp.zeros((N, 2), dtype)
    klb = jnp.asarray(0.1, dtype)
    t_theta = timed(lambda: cost_fn(x0u, u0, thetas, klb))
    record["theta_solves_per_s"] = B / t_theta
    record["theta_solves_per_s_per_host"] = B / t_theta / jax.process_count()

    # --- 3) Seed-sharded closed-loop episode fleet ----------------------
    E = args.fleet_episodes
    fleet = make_sharded_fleet_runner(
        mesh, make_ileqg_plan(rs_prob, ce_cfg.ileqg, 0.0),
        make_gaussian_simulator(rs_prob), 5, rs_prob.c)
    keys = jax.random.split(jax.random.key(7), E)
    t_fleet = timed(lambda: fleet(x0u, u0, keys, ()))
    record["fleet_episodes_per_s"] = E / t_fleet
    record["fleet_episodes_per_s_per_host"] = (
        E / t_fleet / jax.process_count())

    # --- 4) Elite-selection collective, isolated ------------------------
    # The one cross-shard communication step in the PETS generation
    # (per-shard top-k + all_gather of the winners).  Measured on already-
    # sharded inputs so the time is the collective + merge, not rollouts.
    shard = NamedSharding(mesh, P("samples"))
    us_s = jax.device_put(
        jnp.zeros((K, N, 2), dtype)
        + jnp.arange(K, dtype=dtype)[:, None, None], shard)
    costs_s = jax.device_put(jnp.arange(K, dtype=dtype)[::-1], shard)
    elite_fn = jax.jit(lambda u, c: sharded_elite_selection(
        mesh, u, c, max(2, K // 8)))
    t_coll = timed(lambda: elite_fn(us_s, costs_s))
    record["elite_collective_ms"] = t_coll * 1e3

    # --- scaling efficiency vs a single-host baseline -------------------
    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)
        if base.get("sizes") != record["sizes"]:
            record["scaling_note"] = ("baseline sizes differ - efficiency "
                                      "not comparable")
        nproc = jax.process_count()
        for k in ("pets_rollouts_per_s", "theta_solves_per_s",
                  "fleet_episodes_per_s"):
            if base.get(k):
                record[f"scaling_efficiency_{k}"] = (
                    record[k] / (nproc * base[k]))
    return record


def main(argv=None):
    args = parse_args(argv)
    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
        args.platform = args.platform or "cpu"
    import jax
    if args.platform:
        # After import so the override beats the axon sitecustomize hook
        # (which forces jax_platforms="axon,cpu" in every process).
        jax.config.update("jax_platforms", args.platform)

    record = run(args)
    line = json.dumps(record, indent=1)
    if jax.process_index() == 0:
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line)
    if args.coordinator:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
