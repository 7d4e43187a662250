from .distributed import maybe_initialize_distributed
from .mesh import get_mesh, shard_rows
from .sharded_search import sharded_scan_topk

__all__ = [
    "get_mesh",
    "shard_rows",
    "sharded_scan_topk",
    "maybe_initialize_distributed",
]
