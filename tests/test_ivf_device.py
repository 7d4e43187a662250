"""Paged on-device IVF/IVF-PQ search (ops/ivf_paged.py) vs host references."""

import numpy as np
import pytest

import jax.numpy as jnp

from wise_tpu.ops.ivf_paged import (
    build_paged_layout,
    default_chunk,
    ivf_search_paged,
    ivfpq_search_paged,
    paged_budget,
)
from wise_tpu.ops.kmeans import _assign, kmeans
from wise_tpu.ops.topk import numpy_reference_topk


def _build_ivf(rng, n=800, d=32, nlist=20):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    centroids, _ = kmeans(vecs, nlist, iters=10, seed=0)
    assign = np.asarray(_assign(jnp.asarray(vecs), jnp.asarray(centroids)))
    perm = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=nlist)
    offsets = np.zeros(nlist + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return vecs[perm], centroids, offsets


def _run_paged(q, centroids, lay, nprobe, k, chunk=None):
    budget = paged_budget(lay["page_count"], nprobe)
    lpad = lay["paged"].shape[1]
    chunk = chunk or default_chunk(lpad, lay["paged"].shape[2], budget)
    return ivf_search_paged(
        jnp.asarray(q), jnp.asarray(centroids),
        jnp.asarray(lay["page_first"]), jnp.asarray(lay["page_count"]),
        jnp.asarray(lay["paged"]), jnp.asarray(lay["page_rows"]),
        nprobe=nprobe, budget=budget, chunk=chunk, k=k,
    )


def _host_ivf(q, centroids, offsets, sorted_vecs, nprobe, k):
    """Reference probe + exhaustive scan of probed cells (stable order)."""
    cs = q @ centroids.T
    out_v = np.full((len(q), k), -np.inf, np.float32)
    out_r = np.zeros((len(q), k), np.int64)
    for i in range(len(q)):
        cells = np.sort(np.argsort(-cs[i], kind="stable")[:nprobe])
        spans = [(int(offsets[c]), int(offsets[c + 1])) for c in cells]
        spans = [(a, b) for a, b in spans if b > a]
        if not spans:
            continue
        cand = np.concatenate([sorted_vecs[a:b] for a, b in spans])
        rows = np.concatenate([np.arange(a, b) for a, b in spans])
        s = cand @ q[i]
        kk = min(k, len(s))
        o = np.argsort(-s, kind="stable")[:kk]
        out_v[i, :kk] = s[o]
        out_r[i, :kk] = rows[o]
    return out_v, out_r


def test_full_probe_equals_exact(rng):
    sorted_vecs, centroids, offsets = _build_ivf(rng)
    lay = build_paged_layout(sorted_vecs, offsets, lpad=8)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    vals, rows = _run_paged(q, centroids, lay, nprobe=len(centroids), k=10)
    ref_vals, ref_rows = numpy_reference_topk(q, sorted_vecs, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), ref_rows)


@pytest.mark.parametrize("nprobe", [1, 3, 7])
@pytest.mark.parametrize("lpad", [4, 16])
def test_partial_probe_matches_host(rng, nprobe, lpad):
    sorted_vecs, centroids, offsets = _build_ivf(rng, n=1000)
    lay = build_paged_layout(sorted_vecs, offsets, lpad=lpad)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    vals, rows = _run_paged(q, centroids, lay, nprobe=nprobe, k=10, chunk=3)
    hv, hr = _host_ivf(q, centroids, offsets, sorted_vecs, nprobe, 10)
    np.testing.assert_allclose(np.asarray(vals), hv, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), hr)


def test_empty_cells_and_tiny_budget(rng):
    """Cells may be empty (k-means drops them); the slot machinery must skip
    zero-page cells and pad unused slots with the dummy page."""
    sorted_vecs, centroids, offsets = _build_ivf(rng, n=60, nlist=30)
    # force empty cells: clear every third cell by snapping its boundaries
    offsets = offsets.copy()
    keep = np.ones(60, bool)
    for c in range(0, 30, 3):
        keep[offsets[c]:offsets[c + 1]] = False
    lens = np.diff(offsets)
    lens[::3] = 0
    sorted_vecs = sorted_vecs[keep]
    n = len(sorted_vecs)
    offsets = np.zeros(31, np.int64)
    np.cumsum(lens, out=offsets[1:])
    assert (np.diff(offsets) == 0).any()  # at least one empty cell
    lay = build_paged_layout(sorted_vecs, offsets, lpad=16)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    vals, rows = _run_paged(q, centroids, lay, nprobe=30, k=n + 10)
    ref_vals, ref_rows = numpy_reference_topk(q, sorted_vecs, n)
    np.testing.assert_allclose(np.asarray(vals)[:, :n], ref_vals,
                               rtol=1e-5, atol=1e-5)
    # beyond the real rows: -inf padding
    assert np.all(np.isneginf(np.asarray(vals)[:, n:]))


def test_ivfpq_paged_matches_host_adc(rng):
    from wise_tpu.ops.pq import encode_pq, train_pq

    sorted_vecs, centroids, offsets = _build_ivf(rng, n=1000)
    assign = np.searchsorted(offsets, np.arange(1000), side="right") - 1
    resid = sorted_vecs - centroids[assign]
    books = train_pq(resid[:500], 4, 16)
    codes = encode_pq(resid, books)
    lay = build_paged_layout(codes, offsets, lpad=8)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    nprobe, k = 6, 10
    budget = paged_budget(lay["page_count"], nprobe)
    vals, rows = ivfpq_search_paged(
        jnp.asarray(q), jnp.asarray(centroids),
        jnp.asarray(lay["page_first"]), jnp.asarray(lay["page_count"]),
        jnp.asarray(lay["paged"]), jnp.asarray(lay["page_rows"]),
        jnp.asarray(books), nprobe=nprobe, budget=budget, chunk=2, k=k,
    )
    cs = q @ centroids.T
    for i in range(len(q)):
        cells = np.sort(np.argsort(-cs[i], kind="stable")[:nprobe])
        cand_s, cand_r = [], []
        for c in cells:
            a, b = int(offsets[c]), int(offsets[c + 1])
            if b > a:
                dec = np.concatenate(
                    [books[m][codes[a:b, m]] for m in range(4)], axis=1
                )
                cand_s.append(dec @ q[i] + cs[i, c])
                cand_r.append(np.arange(a, b))
        s = np.concatenate(cand_s)
        r = np.concatenate(cand_r)
        o = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_allclose(np.asarray(vals)[i], s[o], rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(rows)[i], r[o])


def test_bf16_paged_storage(rng):
    """bf16 paged storage keeps rank order on well-separated scores."""
    sorted_vecs, centroids, offsets = _build_ivf(rng, n=400)
    lay = build_paged_layout(sorted_vecs, offsets, lpad=8)
    q = sorted_vecs[17][None]  # self-query: top-1 must be row 17
    budget = paged_budget(lay["page_count"], len(centroids))
    vals, rows = ivf_search_paged(
        jnp.asarray(q), jnp.asarray(centroids),
        jnp.asarray(lay["page_first"]), jnp.asarray(lay["page_count"]),
        jnp.asarray(lay["paged"]).astype(jnp.bfloat16),
        jnp.asarray(lay["page_rows"]),
        nprobe=len(centroids), budget=budget, chunk=8, k=5,
    )
    assert int(np.asarray(rows)[0, 0]) == 17


def test_index_device_path_matches_host(tmp_path, rng, monkeypatch):
    """FeatureSearchIndex single-device IVF path == host path == exact (full
    probe)."""
    from tests.test_index import _build_project_store
    from wise_tpu.config import IndexConfig
    from wise_tpu.index import FeatureSearchIndex

    asset, ids, vecs = _build_project_store(tmp_path, n=500, dim=16, seed=5)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/16/test", asset,
        config=IndexConfig(nprobe=10_000),
    )
    idx.create_index("IndexIVFFlat", overwrite=True)
    idx.load_index("IndexIVFFlat")

    q = vecs[42][None]
    host_scores, host_ids = idx._search_ivf_host(q, 10, 10_000)
    dev_scores, dev_ids = idx._search_ivf_device(q, 10, 10_000)
    np.testing.assert_allclose(dev_scores, host_scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(dev_ids, host_ids)
