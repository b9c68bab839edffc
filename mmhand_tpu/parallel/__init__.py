from mmhand_tpu.parallel.mesh import make_mesh
from mmhand_tpu.parallel.sharding import (
    make_sharded_train_step,
    replicate_state_for_mesh,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "replicate_state_for_mesh",
    "shard_batch",
]
