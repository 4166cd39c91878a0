from deeprecsys_tpu.parallel.mesh import make_mesh, distributed_init
from deeprecsys_tpu.parallel.sharding import (
    shard_params,
    sharded_apply,
    sharded_embedding_bag,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "distributed_init",
    "shard_params",
    "sharded_apply",
    "sharded_embedding_bag",
    "make_train_step",
]
