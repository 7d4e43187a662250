#!/usr/bin/env python
"""EpicKitchens-100 multi-instance retrieval mAP (CLI surface matches
/root/reference/scripts/eval/EpicKitchens-100/retrieval_eval.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from wise_tpu.eval.retrieval import (
    build_similarity_matrix,
    calculate_mAP,
    load_ground_truth_segments,
    load_queries,
)


def main(argv=None):
    p = argparse.ArgumentParser(prog="retrieval_eval")
    p.add_argument("--epic-video-segments", required=True)
    p.add_argument("--relevancy-mat-file", required=True)
    p.add_argument("--wise-query", required=True)
    p.add_argument("--wise-search-results", required=True)
    p.add_argument("--iou-threshold", required=True, type=float)
    args = p.parse_args(argv)

    query_ids, query_texts = load_queries(args.wise_query)
    print(f"loaded {len(query_ids)} queries")
    segments, n_segments = load_ground_truth_segments(args.epic_video_segments)
    print(f"loaded {n_segments} video segments")
    sim = build_similarity_matrix(
        args.wise_search_results, query_ids, segments, n_segments,
        args.iou_threshold,
    )
    import pandas as pd

    rel = np.asarray(pd.read_pickle(args.relevancy_mat_file))
    m = calculate_mAP(sim.T, rel.T)
    print(f"mAP = {m:.3f}")
    return m


if __name__ == "__main__":
    main()
