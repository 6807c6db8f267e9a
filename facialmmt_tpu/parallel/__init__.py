from facialmmt_tpu.parallel.mesh import (MeshPlan, batch_sharding, build_mesh,
                                         param_shardings, replicate, shard_batch)
