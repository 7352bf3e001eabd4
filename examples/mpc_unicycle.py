"""Closed-loop MPC demo: drive a stochastic unicycle to a goal with all
four controllers (iLQG, iLEQG, RAT iLQR, RAT iLQR++) and compare.

This reproduces the reference's docs-level usage pattern
(``docs/source/getting-started.md:96-115``) end-to-end: per re-plan, solve
from the current state with a shifted warm start, execute the first step of
the affine policy, repeat.  Runs on whatever backend JAX selects (TPU f32
or CPU).

Usage:  PYTHONPATH=. python examples/mpc_unicycle.py [--steps 30]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import CrossEntropyConfig, ILEQGConfig, NelderMeadConfig
from ratilqr_tpu.models import unicycle
from ratilqr_tpu.mpc import MPCDriver
from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve
from ratilqr_tpu.solvers.nelder_mead import NelderMeadSolver
from ratilqr_tpu.solvers.ratilqr import RATiLQRSolver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--kl-bound", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon hook otherwise "
                         "routes through the TPU tunnel)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.float32
    T = args.horizon
    problem = unicycle(N=T, noise=2e-3, dtype=dtype)
    ileqg_cfg = ILEQGConfig(iter_max=30)
    x0 = jnp.zeros(3, dtype)
    u0 = jnp.zeros((T, 2), dtype)
    key = jax.random.key(0)

    class ILEQGPlan:
        def __init__(self, theta):
            self.theta = theta

        def __call__(self, x, u_warm, key):
            return ileqg_solve(problem, ileqg_cfg, x, u_warm, self.theta)

    rat = RATiLQRSolver(problem, CrossEntropyConfig(
        num_samples=10, mu_init=0.005, sigma_init=0.01, ileqg=ileqg_cfg))
    nm = NelderMeadSolver(problem, NelderMeadConfig(
        iter_max=20, theta_high_init=0.02, theta_low_init=1e-8,
        ileqg=ileqg_cfg))

    controllers = {
        "iLQG (θ=0)": ILEQGPlan(0.0),
        "iLEQG (θ=0.01)": ILEQGPlan(0.01),
        "RAT iLQR": lambda x, u, k: rat.solve(x, u, k,
                                              kl_bound=args.kl_bound),
        "RAT iLQR++": lambda x, u, k: nm.solve(x, u,
                                               kl_bound=args.kl_bound),
    }

    goal = np.asarray([5.0, 5.0])
    print(f"{'controller':<16} {'final dist':>10} {'total cost':>11} "
          f"{'p50 plan ms':>12}")
    for name, plan in controllers.items():
        driver = MPCDriver(problem=problem, plan=plan)
        steps = driver.run(x0, u0, key, num_steps=args.steps)
        xs = np.stack([np.asarray(s.x) for s in steps])
        final_dist = float(np.linalg.norm(xs[-1][:2] - goal))
        # Accumulate the problem's own stage cost (includes the heading
        # term) so the printed metric is the objective the controllers
        # actually optimize.
        total_cost = float(sum(
            problem.c(i, jnp.asarray(s.x), jnp.asarray(s.u))
            for i, s in enumerate(steps)))
        lat = sorted(s.plan_time_s for s in steps[1:])
        p50 = 1e3 * lat[len(lat) // 2]
        print(f"{name:<16} {final_dist:>10.3f} {total_cost:>11.2f} "
              f"{p50:>12.1f}")


if __name__ == "__main__":
    main()
