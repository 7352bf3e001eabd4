"""The RAT iLQR paper's core experiment, in miniature: closed-loop control
under *stochastic model mismatch*.

The planner's internal model is a Gaussian ``N(0, 0.5 I)`` integrator, but
the true world follows the GMM ``0.5·N(0, 0.5I) + 0.5·N(1, I)``
(``optimal_control_problems.jl:102-116``) — a biased, heavier-tailed
disturbance the model-based planners never see.  Compared controllers:

  - iLQG           — risk-neutral, trusts the wrong Gaussian model
  - iLEQG (θ fixed)— risk-sensitive with a hand-picked θ
  - RAT iLQR       — auto-tunes θ from the KL ambiguity budget
  - PETS           — sampling-based CEM on the same wrong internal model

All four controllers optimize the SAME objective (quadratic + soft
barrier).  Reports mean ± stderr of realized closed-loop cost across
seeds, plus how often each fixed-θ planner hit neurotic breakdown and
needed a risk-neutral fallback.  Typical outcome on this toy:

  - the model-based feedback controllers tie on realized cost, but the
    hand-picked θ hits neurotic breakdown on ~30% of re-plans (RAT iLQR
    auto-tunes θ into the feasible range with zero fallbacks);
  - PETS wins outright here: quadratizing the exp barrier hides its tail
    risk from the Riccati-based planners, while Monte-Carlo rollouts see
    it directly — the classic sampling-vs-quadratization trade the paper
    discusses.

Usage: PYTHONPATH=. python examples/model_mismatch.py [--cpu] [--seeds 8]

``--fleet`` runs the same study on-device: each controller's whole
closed-loop episode bank (seeds × re-plans) is ONE vmapped ``lax.scan``
dispatch (``ratilqr_tpu.mpc_episode``), instead of seeds × episode-steps
host-loop dispatches — the way to run this study at hundreds of seeds.
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ratilqr_tpu import (CrossEntropyConfig, ILEQGConfig, PETSConfig,
                         ileqg_solve)
from ratilqr_tpu.models import gmm_integrator
from ratilqr_tpu.mpc import affine_policy_control, shift_warm_start
from ratilqr_tpu.problems import RiskSensitiveProblem
from ratilqr_tpu.solvers import pets as pets_mod
from ratilqr_tpu.solvers.ratilqr import RATiLQRSolver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--episode", type=int, default=15)
    ap.add_argument("--kl-bound", type=float, default=1.0)
    ap.add_argument("--fleet", action="store_true",
                    help="run all seeds on-device (one dispatch per "
                         "controller) via mpc_episode")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.float32
    N = 10  # planning horizon
    gen = gmm_integrator(N=N, dtype=dtype)  # true world (use_true_model)

    # The planners' internal Gaussian model of the same system, with a
    # soft barrier at x1 > 1 — the true GMM's +0.5-per-step drift pushes
    # the state toward it, so underestimating the disturbance is costly
    # (the paper's collision-avoidance setup in miniature).
    def c(k, x, u):
        barrier = jnp.exp(4.0 * (x[0] - 1.0))
        return 0.5 * (x @ x) + 0.5 * (u @ u) + barrier

    def h(x):
        return 5.0 * (x @ x) + jnp.exp(4.0 * (x[0] - 1.0))

    plan_prob = RiskSensitiveProblem(
        f=lambda x, u: x + u, c=c, h=h,
        W=lambda k: jnp.asarray(0.5 * np.eye(2), dtype), N=N)
    # PETS plans on the SAME cost (incl. barrier) with the generative
    # internal dynamics — only the planner class differs.
    from ratilqr_tpu.problems import GenerativeProblem
    gen_plan = GenerativeProblem(f_stochastic=gen.f_stochastic, c=c, h=h,
                                 N=N)

    ileqg_cfg = ILEQGConfig(iter_max=20)
    stage_cost = lambda x, u: float(c(0, x, u))  # realized cost uses the same stage cost

    if args.fleet:
        # On-device study: per controller, ALL seeds' episodes run as one
        # vmapped scan (ratilqr_tpu.mpc_episode).  Same true-world GMM
        # simulator, same planners, same fallback-on-breakdown semantics
        # as the host loops below.
        from ratilqr_tpu.mpc_episode import (PlanOut, make_fleet_runner,
                                             make_ileqg_plan,
                                             make_pets_plan,
                                             make_ratilqr_plan)
        from ratilqr_tpu.solvers import ratilqr as ratilqr_mod
        from ratilqr_tpu.solvers.ileqg import solve as ileqg_solve_fn

        def simulate(k, x, u, key):
            return gen.f_stochastic(x, u, key, True)  # TRUE world step

        def fallback(x, u_warm, key):
            res = ileqg_solve_fn(plan_prob, ileqg_cfg, x, u_warm,
                                 jnp.zeros((), dtype))
            return PlanOut(x=res.x, l=res.l, L=res.L, value=res.value)

        ce_cfg = CrossEntropyConfig(num_samples=10, ileqg=ileqg_cfg)
        pets_cfg = PETSConfig(num_control_samples=64,
                              num_trajectory_samples=16, num_elite=8,
                              iter_max=5)
        sig0 = jnp.asarray(np.eye(2)[None].repeat(N, 0), dtype)

        # Every model-based controller gets the risk-neutral fallback,
        # exactly like the host loop's run_model_based below (PETS has no
        # Riccati feasibility failure mode to fall back from).
        fleets = {
            "iLQG": (make_ileqg_plan(plan_prob, ileqg_cfg, 0.0), (),
                     fallback),
            "iLEQG (θ=0.01)": (make_ileqg_plan(plan_prob, ileqg_cfg, 0.01),
                               (), fallback),
            "RAT iLQR": (make_ratilqr_plan(plan_prob, ce_cfg,
                                           args.kl_bound),
                         ratilqr_mod.init_state(ce_cfg, dtype), fallback),
            "PETS": (make_pets_plan(gen_plan, pets_cfg, sig0), (), None),
        }
        keys = jax.vmap(jax.random.key)(
            jnp.arange(100, 100 + args.seeds))
        x0 = jnp.asarray([-2.0, -2.0], dtype)
        u0 = jnp.zeros((N, 2), dtype)

        print(f"{'controller':<16} {'mean cost':>10} {'stderr':>8} "
              f"{'θ-fallbacks':>12} {'mean θ_opt':>11}")
        for name, (plan, state0, fb) in fleets.items():
            run = make_fleet_runner(plan, simulate, args.episode, c,
                                    fallback=fb)
            ep = run(x0, u0, keys, state0)
            costs = np.asarray(ep.total_cost, np.float64)
            fb_str = f"{int(np.asarray(ep.fallbacks).sum())}" if fb else "—"
            th = (f"{float(np.asarray(ep.aux['theta_opt']).mean()):>11.4f}"
                  if isinstance(ep.aux, dict) and "theta_opt" in ep.aux
                  else f"{'—':>11}")
            print(f"{name:<16} {costs.mean():>10.2f} "
                  f"{costs.std() / np.sqrt(len(costs)):>8.2f} "
                  f"{fb_str:>12} {th}")
        return

    def run_model_based(plan, key, x0):
        x = x0
        u_warm = jnp.zeros((N, 2), dtype)
        total = 0.0
        fallbacks = 0
        for k in range(args.episode):
            key, k_plan, k_sim = jax.random.split(key, 3)
            res = plan(x, u_warm, k_plan)
            if not np.isfinite(float(res.value)):
                # neurotic breakdown at this state: a fixed hand-picked θ
                # can become infeasible mid-episode (RAT iLQR auto-tunes
                # around this).  Fall back to the risk-neutral plan.
                fallbacks += 1
                res = ileqg_solve(plan_prob, ileqg_cfg, x, u_warm, 0.0)
            u = affine_policy_control(x, res.x, res.l, res.L)
            total += stage_cost(x, u)
            x = gen.f_stochastic(x, u, k_sim, True)  # TRUE world step
            u_warm = shift_warm_start(res.l)
        return total, fallbacks

    def run_pets(key, x0):
        config = PETSConfig(num_control_samples=64,
                            num_trajectory_samples=16, num_elite=8,
                            iter_max=5)
        mu0 = jnp.zeros((N, 2), dtype)
        sig0 = jnp.asarray(np.eye(2)[None].repeat(N, 0), dtype)
        x = x0
        mu_warm = mu0
        total = 0.0
        for k in range(args.episode):
            key, k_plan, k_sim = jax.random.split(key, 3)
            st = pets_mod.init_state(mu_warm, sig0)
            out = pets_mod.solve(gen_plan, config, x, st, k_plan)  # wrong model
            u = out.mu[0]
            total += stage_cost(x, u)
            x = gen.f_stochastic(x, u, k_sim, True)
            mu_warm = shift_warm_start(out.mu)
        return total

    x0 = jnp.asarray([-2.0, -2.0], dtype)

    # Controller FACTORIES — a fresh planner per seed so RAT iLQR's CE
    # warm-start state cannot leak across seeds.
    def make_rat():
        rat = RATiLQRSolver(plan_prob, CrossEntropyConfig(
            num_samples=10, ileqg=ileqg_cfg))
        return lambda x, u, k: rat.solve(x, u, k, kl_bound=args.kl_bound)

    controllers = {
        "iLQG": lambda: (lambda x, u, k: ileqg_solve(plan_prob, ileqg_cfg,
                                                     x, u, 0.0)),
        "iLEQG (θ=0.01)": lambda: (lambda x, u, k: ileqg_solve(
            plan_prob, ileqg_cfg, x, u, 0.01)),
        "RAT iLQR": make_rat,
    }

    print(f"{'controller':<16} {'mean cost':>10} {'stderr':>8} "
          f"{'θ-fallbacks':>12}")
    for name, make_plan in controllers.items():
        out = [run_model_based(make_plan(), jax.random.key(100 + s), x0)
               for s in range(args.seeds)]
        costs = [o[0] for o in out]
        fb = sum(o[1] for o in out)
        print(f"{name:<16} {np.mean(costs):>10.2f} "
              f"{np.std(costs) / np.sqrt(len(costs)):>8.2f} {fb:>12}")
    costs = [run_pets(jax.random.key(100 + s), x0)
             for s in range(args.seeds)]
    print(f"{'PETS':<16} {np.mean(costs):>10.2f} "
          f"{np.std(costs) / np.sqrt(len(costs)):>8.2f} {'—':>12}")


if __name__ == "__main__":
    main()
