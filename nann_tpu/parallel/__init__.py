from .mesh import make_mesh
from .sharding import (param_shardings, index_shardings, shard_pytree,
                       batch_shardings, train_state_shardings)
from .collectives import sharded_gather

__all__ = ["make_mesh", "param_shardings", "index_shardings", "shard_pytree",
           "batch_shardings", "train_state_shardings", "sharded_gather"]
