from trajectorycrafter_tpu.parallel.mesh import make_mesh
from trajectorycrafter_tpu.parallel.sharding import (
    dit_param_sharding,
    replicate,
    shard_batch,
)
