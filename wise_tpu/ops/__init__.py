from .topk import exact_topk, scan_topk

__all__ = ["exact_topk", "scan_topk"]
