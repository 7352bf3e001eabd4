from ratilqr_tpu.parallel.mesh import (SAMPLE_AXIS, distributed_initialize,
                                       make_mesh, replicated,
                                       sample_sharding)
from ratilqr_tpu.parallel.sharded import (compute_cost_shard_map,
                                          make_sharded_fleet_runner,
                                          make_sharded_pets_solve,
                                          make_sharded_theta_cost_fn,
                                          sharded_elite_selection)
