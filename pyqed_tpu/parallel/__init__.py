from .mesh import make_mesh, shard_along, replicated, with_sharding, pad_to_multiple
