from .topk import (
    exact_topk,
    flat_topk,
    hier_topk,
    pad_rows,
    scan_topk,
    two_stage_topk,
)

__all__ = [
    "exact_topk",
    "flat_topk",
    "hier_topk",
    "pad_rows",
    "scan_topk",
    "two_stage_topk",
]
