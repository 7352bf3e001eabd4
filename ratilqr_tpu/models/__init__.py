from ratilqr_tpu.models.examples import (cartpole, double_integrator,
                                         gmm_integrator, lqr_problem,
                                         nonlinear_toy, quadrotor, unicycle)
