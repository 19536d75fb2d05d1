from .mesh import build_mesh, data_sharding, replicate, shard_batch

__all__ = ["build_mesh", "data_sharding", "replicate", "shard_batch"]
