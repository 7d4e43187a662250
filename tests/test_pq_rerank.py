"""IVF-PQ exact rerank backstop: when the asset also has an IndexFlatIP
file, ADC candidates are re-scored from the flat file's true f32 rows, so
returned scores/order match the exact search whenever candidate coverage
holds (config.pq_exact_rerank, on by default)."""

import numpy as np

from wise_tpu.config import IndexConfig
from wise_tpu.index import FeatureSearchIndex
from tests.test_index import _build_project_store


def _build_both(tmp_path, n=400, dim=32):
    asset, ids, vecs = _build_project_store(tmp_path, n=n, dim=dim, seed=3)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset,
        config=IndexConfig(pq_m=4, nprobe=64),
    )
    assert idx.create_index("IndexFlatIP", overwrite=True)
    assert idx.create_index("IndexIVFPQ", overwrite=True)
    return asset, ids, vecs


def test_pq_rerank_matches_exact(tmp_path):
    asset, ids, vecs = _build_both(tmp_path)
    cfg = IndexConfig(pq_m=4, nprobe=64)  # rerank on by default
    flat = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    flat.load_index("IndexFlatIP")
    pq = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    pq.load_index("IndexIVFPQ")

    q = vecs[17][None] + 0.01
    fs, fids = flat.search("video", q, topk=10, query_type="vector")
    ps, pids = pq.search("video", q, topk=10, query_type="vector")
    # scores are TRUE f32 dots (plain ADC adds probe_score + LUT approx and
    # essentially never reproduces them), ids in the same order
    np.testing.assert_array_equal(pids, fids)
    np.testing.assert_allclose(ps, fs, rtol=3e-5)


def test_pq_rerank_disabled_is_plain_adc(tmp_path):
    asset, ids, vecs = _build_both(tmp_path)
    cfg_off = IndexConfig(pq_m=4, nprobe=64, pq_exact_rerank=False)
    pq = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg_off
    )
    pq.load_index("IndexIVFPQ")
    q = vecs[17][None] + 0.01
    ps, pids = pq.search("video", q, topk=10, query_type="vector")
    # ADC scores include the quantization approximation: top-1 should still
    # be found on this easy corpus, but scores differ from exact f32
    flat = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset,
        config=IndexConfig(),
    )
    flat.load_index("IndexFlatIP")
    fs, fids = flat.search("video", q, topk=10, query_type="vector")
    assert pids[0] == fids[0]
    assert np.abs(ps[0] - fs[0]) > 1e-6  # lossy ADC score, not a rescore


def test_pq_without_flat_sibling_plain_adc(tmp_path):
    """No IndexFlatIP file AND no refine stage (pq_refine="none") -> plain
    ADC path (no crash, rerank skipped). With the default pq_refine="int8"
    the in-file refine rescore engages instead — test_pq_refine.py."""
    asset, ids, vecs = _build_project_store(tmp_path, n=200, dim=32, seed=5)
    cfg = IndexConfig(pq_m=4, nprobe=64, pq_refine="none")
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    assert idx.create_index("IndexIVFPQ", overwrite=True)
    idx.load_index("IndexIVFPQ")
    q = vecs[3][None]
    ps, pids = idx.search("video", q, topk=5, query_type="vector")
    assert pids[0] == ids[3]
