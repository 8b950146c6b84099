from .mesh import make_mesh, batch_sharding, replicate, shard_batch, constrain_class_axis
from .latency import make_tile_sharded_probs

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_batch",
           "constrain_class_axis", "make_tile_sharded_probs"]
