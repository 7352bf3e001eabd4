"""PETS roofline: measured vs attainable rollouts/s on one TPU chip.

The PETS hot loop (``/root/reference/src/pets.jl:100-157``) is the
reference's flagship distributed workload: K control samples x M
Monte-Carlo trajectory samples x T time steps of ``f_stochastic`` calls
per CEM generation.  Here the whole generation is one fused
``vmap x vmap x scan`` (``solvers/pets.py``), so the attainable rate is
set by the hardware, not dispatch.  This script

  1. measures DEVICE-ONLY time per generation by differencing two
     ``iter_max`` values inside single dispatches (the ~27 ms tunnel
     round trip and the per-solve fixed costs — sampling Cholesky,
     ``top_k``, distribution refit — cancel exactly),
  2. states the attainable rate from an analytic per-step op count
     (below), and
  3. reports measured vs attainable for the PRNG/unroll variants that
     matter on TPU.

Analytic op count (gmm_integrator fixture, n = m = 2, f32, internal
model), per rollout step per lane with the default threefry2x32 PRNG:

  pre-scan per-step key     1 threefry block            ~105 int-ops
  f_stochastic split(k)     2 blocks                    ~210
  normal(k1, (2,))          1 block + u32->f32 + erfinv ~105 + 10 + 40
  dynamics x + u + w                                        4
  stage cost k/2(x@x+u@u)                                  ~10
                                                        ---------
                                                        ~480 ops

(one threefry2x32 block = 2 u32 words through 20 ARX rounds of
add/rotate/xor ≈ 5 ops/round + key schedule ≈ 105 integer ops.)  ~90% of
the work is integer PRNG arithmetic — the rollout grid is a PRNG
benchmark wearing a control-theory hat.  NOTE: XLA's own
``cost_analysis()`` "flops" metric counts only floating ops — measured
~49 flops + ~1 transcendental per step-lane on this fixture, i.e. just
the non-PRNG tail — so the roofline must be stated against the analytic
integer-op count, at the VPU's ~4 T op/s f32/i32 vector rate (the MXU is
idle: nothing here is a matmul).  HBM is irrelevant: the per-step
working set (x: 2, cost: 1 floats/lane; u_t shared across the M axis)
lives in registers/VMEM inside the fused scan body, so the workload is
compute-bound — the opposite regime from the Riccati kernel
(docs/performance.md).

Levers measured:
  - ``scan_unroll``: fuses k steps per scan iteration, amortizing the
    per-step sequencing overhead of the tiny elementwise kernels
    (``PETSConfig.scan_unroll``; results bit-identical).
  - ``rbg`` keys: ``jax.random.key(seed, impl="rbg")`` routes bit
    generation through the TPU's hardware ``RngBitGenerator``.  Measured
    SLOWER here (~2x): per-step draws are 2 floats/lane, far too small
    to amortize the generator's fixed per-invocation cost, and the
    per-step ``split`` chain stays threefry anyway.  Recorded to pin the
    negative result.

Usage (on the TPU): python benchmarks/pets_roofline.py
Writes benchmarks/pets_roofline.json; docs/performance.md "PETS
roofline" renders the result.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ratilqr_tpu import PETSConfig
from ratilqr_tpu.models import gmm_integrator
from ratilqr_tpu.solvers import pets
from ratilqr_tpu.utils.profiling import time_fn

K, M, T = 1024, 16, 50          # the pets_16k bench config
OPS_PER_STEP_LANE = 480         # analytic count, derivation in docstring
VPU_OPS = 4.0e12                # v5e vector f32/i32 peak (MXU idle here)

G_LO, G_HI = 5, 55              # generation counts for the differencing


def build(unroll, impl):
    dtype = jnp.float32
    prob = gmm_integrator(N=T, dtype=dtype)
    mk = lambda iters: PETSConfig(
        num_control_samples=K, num_trajectory_samples=M, num_elite=32,
        iter_max=iters, scan_unroll=unroll)
    state = pets.init_state(jnp.zeros((T, 2), dtype),
                            jnp.eye(2, dtype=dtype)[None].repeat(T, 0))
    x0 = jnp.zeros(2, dtype)
    key = jax.random.key(0, impl=impl)
    return prob, mk(G_LO), mk(G_HI), x0, state, key


def device_time_per_gen(prob, cfg_lo, cfg_hi, x0, state, key):
    """(t(G_HI gens) - t(G_LO gens)) / (G_HI - G_LO): dispatch latency and
    per-solve fixed costs cancel; what remains is pure per-generation
    device time.  Each t is a best-of-reps fetch-synced single dispatch."""
    t_lo = time_fn(lambda k: pets.solve(prob, cfg_lo, x0, state, k).mu,
                   key, reps=5)
    t_hi = time_fn(lambda k: pets.solve(prob, cfg_hi, x0, state, k).mu,
                   key, reps=5)
    return (t_hi["best"] - t_lo["best"]) / (G_HI - G_LO), t_lo


def main():
    assert jax.devices()[0].platform != "cpu", "roofline is a TPU measurement"
    bound_s = K * M * T * OPS_PER_STEP_LANE / VPU_OPS
    results = {"device": str(jax.devices()[0]), "K": K, "M": M, "T": T,
               "rollouts_per_gen": K * M,
               "ops_per_step_lane_analytic": OPS_PER_STEP_LANE,
               "bound_vpu_s_per_gen": bound_s,
               "attainable_rollouts_per_s": K * M / bound_s,
               "protocol": f"device time/gen = (t({G_HI} gens) - "
                           f"t({G_LO} gens))/{G_HI - G_LO}, best-of-5 "
                           "fetch-synced dispatches each; attainable rate "
                           "from the analytic ~480 int+float ops/step-lane "
                           "at 4 T op/s VPU peak (XLA 'flops' counts only "
                           "the ~50 float ops/step-lane tail - threefry "
                           "is integer ARX)"}

    variants = [("threefry_u1", 1, "threefry2x32"),
                ("threefry_u10", 10, "threefry2x32"),
                ("rbg_u1", 1, "rbg"),
                ("rbg_u10", 10, "rbg")]
    for name, unroll, impl in variants:
        prob, cfg, cfg_hi, x0, state, key = build(unroll, impl)
        dt_gen, t_lo = device_time_per_gen(prob, cfg, cfg_hi, x0, state,
                                           key)
        v = {
            "device_s_per_gen": dt_gen,
            "rollouts_per_s_device": K * M / dt_gen,
            "single_dispatch_solve_ms": round(t_lo["best"] * 1e3, 2),
            "fraction_of_roofline": (bound_s / dt_gen
                                     if impl == "threefry2x32" else None),
        }
        results[name] = v
        frac = v["fraction_of_roofline"]
        print(f"{name:14s} {dt_gen*1e6:9.1f} us/gen  "
              f"{v['rollouts_per_s_device']/1e6:7.2f} M rollouts/s  "
              + (f"roofline frac {frac:.2f}" if frac else "(rbg: analytic "
                 "threefry bound not applicable)"), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "pets_roofline.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
