from .mesh import make_mesh, shard_along, replicated, with_sharding, pad_to_multiple
from .distributed import ensure_distributed, process_info, global_mesh
