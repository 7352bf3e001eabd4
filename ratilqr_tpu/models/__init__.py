from ratilqr_tpu.models.examples import (double_integrator, gmm_integrator,
                                         lqr_problem, nonlinear_toy,
                                         unicycle)
