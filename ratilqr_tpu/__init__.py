"""ratilqr_tpu — TPU-native risk-sensitive trajectory optimization.

A JAX/XLA/Pallas re-design of the algorithm suite in StanfordMSL/RATiLQR.jl
(reference mounted at ``/root/reference``): iLQG, iLEQG, RAT iLQR (Cross
Entropy bilevel), RAT iLQR++ (Nelder-Mead bilevel) and PETS — built
TPU-first: scanned rollouts/Riccati recursions, vmapped solver banks instead
of process fan-out, mesh-sharded sampling instead of Julia ``Distributed``.
"""

from ratilqr_tpu.config import (CrossEntropyConfig, ILEQGConfig,
                                NelderMeadConfig, PETSConfig)
from ratilqr_tpu.problems import (GenerativeProblem, OptimalControlProblem,
                                  RiskSensitiveProblem)
from ratilqr_tpu.ops import (Approximation, DPResult, approximate_model,
                             decrease_mu_delta, dp_evaluate, dp_optimize,
                             increase_mu_delta, integrate_cost,
                             rollout_feedback, rollout_feedback_noisy,
                             rollout_generative, rollout_open_loop,
                             rollout_open_loop_noisy)
from ratilqr_tpu.solvers.ileqg import (ILEQGResult, make_batched_solver,
                                       solve as ileqg_solve, solve_value)
from ratilqr_tpu.mpc_episode import (EpisodeResult, PlanOut,
                                     make_episode_runner, make_fleet_runner,
                                     make_gaussian_simulator,
                                     make_ileqg_plan, make_nm_plan,
                                     make_pets_plan, make_ratilqr_plan)

__version__ = "0.1.0"
