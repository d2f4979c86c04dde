"""Device mesh + sharding layout for SPMD training/serving."""

from .mesh import make_mesh, data_sharding, replicated, shard_batch
from .sharding import tp_spec, state_shardings, shard_state

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "tp_spec", "state_shardings", "shard_state"]
