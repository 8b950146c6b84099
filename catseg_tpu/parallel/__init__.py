from .mesh import make_mesh, batch_sharding, replicate, shard_batch, constrain_class_axis

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_batch", "constrain_class_axis"]
