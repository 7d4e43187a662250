"""On-device jitted IVF search (ops/ivf.py) vs host path and exact scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.ops.ivf import ivf_search
from wise_tpu.ops.kmeans import _assign, kmeans
from wise_tpu.ops.topk import numpy_reference_topk


def _build_ivf(rng, n=800, d=32, nlist=20):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    centroids, _ = kmeans(vecs, nlist, iters=10, seed=0)
    assign = np.asarray(_assign(jnp.asarray(vecs), jnp.asarray(centroids)))
    perm = np.argsort(assign, kind="stable")
    sorted_vecs = vecs[perm]
    counts = np.bincount(assign, minlength=nlist)
    offsets = np.zeros(nlist + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return vecs, sorted_vecs, perm, centroids, offsets


def test_full_probe_equals_exact(rng):
    vecs, sorted_vecs, perm, centroids, offsets = _build_ivf(rng)
    lmax = int(np.max(np.diff(offsets)))
    q = rng.standard_normal((3, 32)).astype(np.float32)
    vals, rows = ivf_search(
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(offsets),
        jnp.asarray(sorted_vecs), nprobe=len(centroids), lmax=lmax, k=10,
    )
    ref_vals, ref_rows = numpy_reference_topk(q, sorted_vecs, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), ref_rows)


def test_partial_probe_recall(rng):
    vecs, sorted_vecs, perm, centroids, offsets = _build_ivf(rng, n=1000)
    lmax = int(np.max(np.diff(offsets)))
    hits = 0
    for i in range(0, 100, 10):
        q = sorted_vecs[i][None]
        vals, rows = ivf_search(
            jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(offsets),
            jnp.asarray(sorted_vecs), nprobe=4, lmax=lmax, k=1,
        )
        hits += int(np.asarray(rows)[0, 0] == i)
    assert hits >= 9  # self-queries land in their own probed cell


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
