from ratilqr_tpu.utils.numerics import isapprox, max_control_deviation
