from .distributed import host_local_batch_slice, initialize, make_global_array, process_count, process_index
from .mesh import data_sharding, make_hybrid_mesh, make_mesh, replicate, replicated_sharding, shard_batch

__all__ = [
    "make_mesh", "make_hybrid_mesh", "shard_batch", "replicate", "data_sharding", "replicated_sharding",
    "initialize", "process_count", "process_index", "host_local_batch_slice",
    "make_global_array",
]
