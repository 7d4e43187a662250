from .topk import exact_topk, hier_topk, pad_rows, scan_topk

__all__ = ["exact_topk", "hier_topk", "pad_rows", "scan_topk"]
