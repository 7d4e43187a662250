"""Product quantization + IndexIVFPQ."""

import numpy as np
import pytest

from wise_tpu.config import IndexConfig
from wise_tpu.index import FeatureSearchIndex
from wise_tpu.ops.pq import adc_scores, adc_tables, encode_pq, train_pq
from wise_tpu.ops.topk import numpy_reference_topk


def test_pq_round_trip_accuracy(rng):
    n, d, m = 2000, 32, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    codebooks = train_pq(x, m)
    codes = encode_pq(x, codebooks)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    # reconstruct and check quantization error is small relative to signal
    dsub = d // m
    recon = np.concatenate(
        [codebooks[i][codes[:, i]] for i in range(m)], axis=1
    )
    rel_err = np.linalg.norm(x - recon) / np.linalg.norm(x)
    assert rel_err < 0.6  # 256 codes per 4-dim subspace -> decent fidelity


def test_adc_matches_reconstruction(rng):
    n, d, m = 500, 32, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    codebooks = train_pq(x, m)
    codes = encode_pq(x, codebooks)
    q = rng.standard_normal(d).astype(np.float32)
    tables = adc_tables(q, codebooks)
    s = adc_scores(codes, tables)
    dsub = d // m
    recon = np.concatenate(
        [codebooks[i][codes[:, i]] for i in range(m)], axis=1
    )
    np.testing.assert_allclose(s, recon @ q, rtol=1e-4, atol=1e-4)


def test_ivfpq_index_recall(tmp_path, rng):
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=600, dim=32, seed=3)
    cfg = IndexConfig(pq_m=8, pq_train_samples=600)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    assert idx.create_index("IndexIVFPQ", overwrite=True)
    assert idx.load_index("IndexIVFPQ")
    assert "codes" in idx._arrays and "vectors" not in idx._arrays

    idx.config.nprobe = 10_000  # probe everything: recall limited only by PQ
    hits = 0
    for i in range(0, 100, 5):
        _, gi = idx.search("video", vecs[i][None], topk=10, query_type="vector")
        hits += int(ids[i] in gi)
    assert hits >= 17  # >=85% top-10 self-recall under 8-byte codes
