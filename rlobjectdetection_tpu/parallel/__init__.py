from .mesh import data_sharding, make_mesh, replicate, replicated_sharding, shard_batch

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding", "replicated_sharding"]
