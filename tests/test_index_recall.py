import numpy as np

from wise_tpu.config import IndexConfig
from wise_tpu.eval.index_recall import evaluate_index, recall_at_k, top1_recall_at_n
from wise_tpu.index import FeatureSearchIndex


def test_recall_metrics_unit():
    exact = np.array([[1, 2, 3], [4, 5, 6]])
    ann_perfect = exact.copy()
    assert recall_at_k(exact, ann_perfect, 3) == 1.0
    ann_half = np.array([[1, 9, 8], [4, 5, 7]])
    assert abs(recall_at_k(exact, ann_half, 3) - 0.5) < 1e-9
    assert top1_recall_at_n(exact, ann_half, 1) == 1.0
    ann_miss = np.array([[9, 9, 9], [4, 5, 6]])
    assert top1_recall_at_n(exact, ann_miss, 3) == 0.5


def test_evaluate_ivf_index(tmp_path, rng):
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=400, dim=16, seed=7)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/16/test", asset,
        config=IndexConfig(nprobe=1_000_000),
    )
    idx.create_index("IndexIVFFlat", overwrite=True)
    idx.load_index("IndexIVFFlat")
    queries = vecs[rng.permutation(400)[:20]]
    m = evaluate_index(idx, queries, vecs, ids, topk=10, r1_n=10)
    # probing all cells => exact
    assert m["R0@10"] == 1.0
    assert m["R1@10"] == 1.0
    assert m["sec_per_query"] > 0
