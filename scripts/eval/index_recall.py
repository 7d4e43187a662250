#!/usr/bin/env python
"""Evaluate an ANN index (IVF/PQ) against the exhaustive scan on a project's
feature store — the reference's Search-Index-Evaluation protocol (R0@K /
R1@N,K and sec/query).

    python scripts/eval/index_recall.py --project-dir P --media-type video \
        --index-type IndexIVFFlat --nprobe 64 --num-queries 100
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from wise_tpu.eval.index_recall import evaluate_index
from wise_tpu.index import FeatureSearchIndex
from wise_tpu.project import WiseProject


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--project-dir", required=True)
    p.add_argument("--media-type", default="video")
    p.add_argument("--index-type", default="IndexIVFFlat",
                   choices=["IndexIVFFlat", "IndexIVFPQ"])
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--num-queries", type=int, default=100)
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--asset-index", type=int, default=0)
    args = p.parse_args()

    project = WiseProject(args.project_dir)
    assets = project.discover_assets()
    asset_ids = list(assets[args.media_type])
    asset_id = asset_ids[args.asset_index]
    asset = assets[args.media_type][asset_id]

    config = project.load_config().index
    config.nprobe = args.nprobe
    index = FeatureSearchIndex(args.media_type, asset_id, asset, config=config)
    if not index.load_index(args.index_type):
        print(f"no {args.index_type} index; run create-index.py first")
        return 1

    # exhaustive ground truth straight from the store
    ids, vecs = index._load_store_matrix(index._open_store())
    rng = np.random.default_rng(0)
    q_idx = rng.permutation(len(vecs))[: args.num_queries]
    queries = vecs[q_idx]

    metrics = evaluate_index(index, queries, vecs, ids, topk=args.topk)
    print(f"{args.index_type} nprobe={args.nprobe} on {len(vecs)} vectors:")
    for k, v in metrics.items():
        print(f"  {k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
