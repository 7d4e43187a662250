"""int8 refine stage inside the IVF-PQ .widx (config.pq_refine, default
"int8").

When no IndexFlatIP sibling exists, ADC candidates are re-scored on the
host from per-row symmetric int8 codes stored in the same file (D bytes +
4-byte scale per row — 25% of an f32 flat sibling, the storage objection
to the round-2 rerank backstop). PQ subspace-codebook error then only
affects candidate selection; returned scores carry int8 precision
(~1e-3 relative). Reference quality bar: the faiss IndexIVFPQ row of
/root/reference/docs/Search-Index-Evaluation.md (R0@20=0.904 real-data).
"""

import numpy as np

from tests.test_index import _build_project_store
from wise_tpu.config import IndexConfig
from wise_tpu.index import FeatureSearchIndex
from wise_tpu.index.format import read_index_file
from wise_tpu.store import TarShardStore


def _make_index(tmp_path, n=400, dim=32, seed=3, **cfg_kw):
    asset, ids, vecs = _build_project_store(tmp_path, n=n, dim=dim, seed=seed)
    cfg = IndexConfig(pq_m=4, nprobe=10_000, **cfg_kw)
    idx = FeatureSearchIndex(
        "video", f"wise/random_features/{dim}/test", asset, config=cfg
    )
    assert idx.create_index("IndexIVFPQ", overwrite=True)
    assert idx.load_index("IndexIVFPQ")
    return idx, ids, vecs


def test_refine_arrays_stored_by_default(tmp_path):
    idx, ids, vecs = _make_index(tmp_path)
    meta, arrays = read_index_file(idx.index_path("IndexIVFPQ"))
    assert arrays["refine_codes"].dtype == np.int8
    assert arrays["refine_codes"].shape == vecs.shape
    assert arrays["refine_scales"].dtype == np.float32
    assert arrays["refine_scales"].shape == (len(vecs),)
    # codes are stored in PQ (cell-sorted) row order: decoding row r must
    # reproduce the vector whose id is ids[r]
    stored_ids = np.asarray(arrays["ids"])
    dec = (
        np.asarray(arrays["refine_codes"][:5], np.float32)
        * np.asarray(arrays["refine_scales"][:5])[:, None]
    )
    np.testing.assert_allclose(dec, vecs[stored_ids[:5] - 1], atol=5e-3)


def test_refine_none_restores_codes_only_format(tmp_path):
    idx, _, _ = _make_index(tmp_path, pq_refine="none")
    _, arrays = read_index_file(idx.index_path("IndexIVFPQ"))
    assert "refine_codes" not in arrays and "refine_scales" not in arrays


def test_refine_rerank_matches_exact_to_int8_precision(tmp_path):
    """No flat sibling + full probe coverage: refine-reranked top-k ids
    equal the exact scan's, scores within int8 rounding of true dots."""
    idx, ids, vecs = _make_index(tmp_path)
    q = vecs[17][None] + 0.01
    ps, pids = idx.search("video", q, topk=10, query_type="vector")
    exact = q[0] @ vecs.T
    order = np.argsort(-exact, kind="stable")[:10]
    np.testing.assert_array_equal(pids, ids[order])
    np.testing.assert_allclose(ps, exact[order], atol=2e-2)


def test_refine_fixes_adc_ranking_on_adversarial_spectrum(tmp_path):
    """The round-2 adversarial case (decaying spectrum mixed into every
    subvector by a random rotation) breaks plain ADC ranking; the int8
    refine rescore must recover (near-)exact top-k regardless."""
    rng = np.random.default_rng(7)
    n, dim = 600, 64
    z = rng.standard_normal((n, dim)) * (1.0 / np.sqrt(1.0 + np.arange(dim)))
    qmat, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    vecs = (z @ qmat).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    fdir = tmp_path / "features"
    fdir.mkdir(parents=True)
    store = TarShardStore("video", fdir)
    store.enable_write(shard_maxcount=128, shard_maxsize=1 << 24)
    ids = np.arange(1, n + 1)
    for i, v in zip(ids, vecs):
        store.add(int(i), v[None])
    store.close()
    asset = {"features_dir": str(fdir), "index_dir": str(tmp_path / "index")}

    k = 10
    queries = vecs[:8]
    exact = np.argsort(-(queries @ vecs.T), axis=1, kind="stable")[:, :k]

    def recall(cfg):
        idx = FeatureSearchIndex(
            "video", "wise/random_features/64/test", asset, config=cfg
        )
        idx.create_index("IndexIVFPQ", overwrite=True)
        idx.load_index("IndexIVFPQ")
        _, got = idx.search_batch(queries, topk=k)
        return np.mean(
            [len(set(got[i]) & set(ids[exact[i]])) / k for i in range(8)]
        )

    base = IndexConfig(pq_m=8, nprobe=10_000, pq_opq=False,
                       pq_train_samples=n)
    import dataclasses

    r_adc = recall(dataclasses.replace(base, pq_exact_rerank=False))
    r_ref = recall(base)
    assert r_ref >= 0.95, f"refine recall {r_ref}"
    assert r_ref > r_adc + 0.1, (r_ref, r_adc)


def test_flat_sibling_still_preferred_over_refine(tmp_path):
    """With both a flat sibling and refine codes, the exact f32 rescore
    wins: returned scores match the flat search bit-tightly (int8 refine
    scores would differ at the ~1e-3 level)."""
    idx, ids, vecs = _make_index(tmp_path)
    assert idx.create_index("IndexFlatIP", overwrite=True)
    idx.load_index("IndexIVFPQ")  # reload: flat sibling is now visible
    flat = FeatureSearchIndex(
        "video", "wise/random_features/32/test", idx.asset,
        config=IndexConfig(),
    )
    flat.load_index("IndexFlatIP")
    q = vecs[23][None] + 0.02
    fs, fids = flat.search("video", q, topk=10, query_type="vector")
    ps, pids = idx.search("video", q, topk=10, query_type="vector")
    np.testing.assert_array_equal(pids, fids)
    np.testing.assert_allclose(ps, fs, rtol=3e-5)


def test_reconstruct_uses_refine_codes(tmp_path):
    """find-similar quality: reconstruction error drops from PQ-decode
    (cos ~0.8 on random data) to int8 rounding (cos > 0.999)."""
    idx, ids, vecs = _make_index(tmp_path)
    stored_ids = np.asarray(idx._arrays["ids"])
    rec = idx.reconstruct_rows(np.arange(len(stored_ids)))
    orig = vecs[stored_ids - 1]
    cos = np.sum(rec * orig, axis=1) / (
        np.linalg.norm(rec, axis=1) * np.linalg.norm(orig, axis=1)
    )
    assert cos.min() > 0.999
