from .mesh import get_mesh, shard_rows
from .sharded_search import sharded_scan_topk

__all__ = ["get_mesh", "shard_rows", "sharded_scan_topk"]
