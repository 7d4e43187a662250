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


def test_ivfpq_device_matches_host(tmp_path, rng):
    """On-device jitted ADC (ops/ivfpq.py) == host numpy ADC, including
    partial probes and empty cells."""
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=700, dim=32, seed=7)
    cfg = IndexConfig(pq_m=8, pq_train_samples=700)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    idx.create_index("IndexIVFPQ", overwrite=True)
    idx.load_index("IndexIVFPQ")

    q = np.concatenate([vecs[3][None], vecs[99][None]])
    for nprobe in (1, 4, 10_000):
        host_s, host_r = idx._search_ivfpq_host(q, 10, nprobe)
        dev_s, dev_r = idx._search_ivfpq_device(q, 10, nprobe)
        np.testing.assert_allclose(dev_s, host_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(dev_r, host_r)


def test_ivfpq_device_full_probe_matches_flat_adc(tmp_path, rng):
    """Full probe: device path scores every code exactly once; scores equal
    cell-centroid IP + flat adc_scores."""
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=300, dim=16, seed=11)
    cfg = IndexConfig(pq_m=4, pq_train_samples=300)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/16/test", asset, config=cfg
    )
    idx.create_index("IndexIVFPQ", overwrite=True)
    idx.load_index("IndexIVFPQ")

    codes = np.asarray(idx._arrays["codes"])
    centroids = np.asarray(idx._arrays["centroids"])
    offsets = np.asarray(idx._arrays["cell_offsets"])
    books = np.asarray(idx._arrays["pq_codebooks"])
    cell_of_row = np.searchsorted(offsets, np.arange(len(codes)), side="right") - 1

    q = vecs[10][None]
    # OPQ stores rotated centroids/codebooks; the reference computation
    # lives in the rotated space too
    qr = q @ np.asarray(idx._arrays["opq_rotation"]) \
        if "opq_rotation" in idx._arrays else q
    flat = adc_scores(codes, adc_tables(qr[0], books))
    flat = flat + (centroids @ qr[0])[cell_of_row]
    k = 15
    order = np.argsort(-flat, kind="stable")[:k]
    dev_s, dev_r = idx._search_ivfpq_device(q, k, 10_000)
    np.testing.assert_array_equal(dev_r[0], order)
    np.testing.assert_allclose(dev_s[0], flat[order], rtol=1e-4, atol=1e-4)


def test_ivfpq_overlong_topk_reports_minus_one_ids(tmp_path, rng):
    """topk >> corpus: empty slots carry id -1 / -inf score (faiss
    convention) so hydration drops them instead of showing row-0 media."""
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=50, dim=16, seed=2)
    cfg = IndexConfig(pq_m=4, pq_train_samples=50)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/16/test", asset, config=cfg
    )
    idx.create_index("IndexIVFPQ", overwrite=True)
    idx.load_index("IndexIVFPQ")
    scores, got = idx.search_batch(vecs[:2], topk=200)
    assert scores.shape == got.shape == (2, 200)
    empty = np.isneginf(scores)
    assert empty.any() and (got[empty] == -1).all()
    assert (got[~empty] != -1).all()


def test_ivfpq_reconstruct_rows(tmp_path, rng):
    """faiss reconstruct_batch parity: PQ indexes reconstruct approximate
    vectors (centroid + codebook residual), close to the originals."""
    from tests.test_index import _build_project_store

    asset, ids, vecs = _build_project_store(tmp_path, n=400, dim=32, seed=13)
    cfg = IndexConfig(pq_m=8, pq_train_samples=400)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    idx.create_index("IndexIVFPQ", overwrite=True)
    idx.load_index("IndexIVFPQ")
    stored_ids = np.asarray(idx._arrays["ids"])
    rec = idx.reconstruct_rows(np.arange(len(stored_ids)))
    orig = vecs[stored_ids - 1]  # ids are 1-based over vecs
    cos = np.sum(rec * orig, axis=1) / (
        np.linalg.norm(rec, axis=1) * np.linalg.norm(orig, axis=1)
    )
    assert cos.mean() > 0.75 and cos.min() > 0.3


def test_opq_beats_plain_pq_on_rotated_spectrum(rng):
    """The round-2 adversarial case: a decaying spectrum mixed into every
    subvector by a random rotation. OPQ's learned rotation must recover
    most of the axis-aligned recall that plain PQ loses (BENCHMARKS.md
    recall section; reference bar docs/Search-Index-Evaluation.md)."""
    from wise_tpu.ops.pq import train_opq

    n, d, m, ksub, k = 4000, 64, 8, 64, 10
    z = rng.standard_normal((n, d)) * (1.0 / np.sqrt(1.0 + np.arange(d)))
    qmat, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (z @ qmat).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    queries = x[:16]
    exact = np.argsort(-(queries @ x.T), axis=1, kind="stable")[:, :k]

    def r_at_k(codes, books, rot=None):
        qs = queries @ rot if rot is not None else queries
        hits = 0
        for qi in range(len(queries)):
            s = adc_scores(codes, adc_tables(qs[qi], books))
            got = np.argsort(-s, kind="stable")[:k]
            hits += len(np.intersect1d(got, exact[qi]))
        return hits / (len(queries) * k)

    books_p = train_pq(x, m, ksub, iters=6)
    r_plain = r_at_k(encode_pq(x, books_p), books_p)

    rot, books_o = train_opq(x, m, ksub, iters=6, opq_iters=5, seed=0)
    # orthogonality is what makes the centroid-rotation trick exact
    np.testing.assert_allclose(
        rot @ rot.T, np.eye(d), rtol=0, atol=1e-4
    )
    r_opq = r_at_k(encode_pq(x @ rot, books_o), books_o, rot=rot)
    assert r_opq >= r_plain + 0.05, (r_plain, r_opq)
