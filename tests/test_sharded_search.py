"""Multi-chip sharded scan == single-device scan == numpy reference,
on the simulated 8-device CPU mesh (SURVEY.md §4: the distributed testing the
reference lacks)."""

import jax
import numpy as np
import pytest

from wise_tpu.ops.topk import numpy_reference_topk
from wise_tpu.parallel import get_mesh, sharded_scan_topk
from wise_tpu.parallel.sharded_search import pad_and_shard_db


@pytest.mark.parametrize("n,d,q,k", [(1000, 64, 3, 10), (777, 32, 2, 5)])
def test_sharded_matches_reference(rng, n, d, q, k):
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = get_mesh(dp=8)
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    db_sharded, n_total = pad_and_shard_db(mesh, db)
    vals, idx = sharded_scan_topk(mesh, queries, db_sharded, n_total, k)

    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)


def test_sharded_tiny_db_with_padding(rng):
    """Regression: zero-padding rows (score 0) must never beat negative true
    scores — the validity mask must apply before the shard-local top-k."""
    from wise_tpu.ops.topk import pad_rows

    mesh = get_mesh(dp=8)
    db = -np.abs(rng.standard_normal((2, 16))).astype(np.float32)  # all neg
    q = np.ones((1, 16), dtype=np.float32)
    host = pad_rows(db, 4096)  # heavy zero padding
    db_sharded, _ = pad_and_shard_db(mesh, host)
    vals, idx = sharded_scan_topk(mesh, q, db_sharded, 2, 5)
    assert set(np.asarray(idx)[0]) == {0, 1}
    assert np.isfinite(np.asarray(vals)).all()
    ref_vals, ref_idx = numpy_reference_topk(q, db, 2)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)


def test_sharded_small_mesh(rng):
    mesh = get_mesh(dp=4, devices=jax.devices()[:4])
    db = rng.standard_normal((64, 16)).astype(np.float32)
    queries = rng.standard_normal((1, 16)).astype(np.float32)
    db_sharded, n_total = pad_and_shard_db(mesh, db)
    vals, idx = sharded_scan_topk(mesh, queries, db_sharded, n_total, 8)
    ref_vals, ref_idx = numpy_reference_topk(queries, db, 8)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)


# ---------------------------------------------------------------------------
# sharded IVF / IVF-PQ (multi-chip cell search)
# ---------------------------------------------------------------------------

def _make_ivf_index(tmp_path, index_type, n=900, dim=32, **cfg_kw):
    from tests.test_index import _build_project_store
    from wise_tpu.config import IndexConfig
    from wise_tpu.index import FeatureSearchIndex

    asset, ids, vecs = _build_project_store(tmp_path, n=n, dim=dim, seed=21)
    idx = FeatureSearchIndex(
        "video", f"wise/random_features/{dim}/test", asset,
        config=IndexConfig(**cfg_kw),
    )
    idx.create_index(index_type, overwrite=True)
    idx.load_index(index_type)
    return idx, ids, vecs


def test_sharded_ivf_matches_host(tmp_path):
    """8-device shard_map IVF == host-orchestrated path, across nprobe."""
    idx, ids, vecs = _make_ivf_index(tmp_path, "IndexIVFFlat")
    q = np.concatenate([vecs[5][None], vecs[700][None]])
    for nprobe in (1, 4, 10_000):
        host_s, host_r = idx._search_ivf_host(q, 10, nprobe)
        dev_s, dev_r = idx._search_ivf_sharded(q, 10, nprobe)
        np.testing.assert_allclose(dev_s, host_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(dev_r, host_r)


def test_sharded_ivf_full_probe_is_exact(tmp_path):
    from wise_tpu.ops.topk import numpy_reference_topk

    idx, ids, vecs = _make_ivf_index(tmp_path, "IndexIVFFlat", n=500, dim=16)
    sorted_vecs = np.asarray(idx._arrays["vectors"])
    q = vecs[33][None]
    vals, rows = idx._search_ivf_sharded(q, 7, 10_000)
    ref_vals, ref_rows = numpy_reference_topk(q, sorted_vecs, 7)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(rows, ref_rows)


def test_sharded_ivfpq_matches_host(tmp_path):
    idx, ids, vecs = _make_ivf_index(
        tmp_path, "IndexIVFPQ", pq_m=8, pq_train_samples=900
    )
    q = np.concatenate([vecs[5][None], vecs[700][None]])
    for nprobe in (1, 4, 10_000):
        host_s, host_r = idx._search_ivfpq_host(q, 10, nprobe)
        dev_s, dev_r = idx._search_ivfpq_sharded(q, 10, nprobe)
        np.testing.assert_allclose(dev_s, host_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(dev_r, host_r)


def test_sharded_ivf_at_1m_rows(rng):
    """8-way sharded IVF at >= 1M rows (VERDICT round-1: the sharded tests
    only ever saw ~1k rows). Cells are synthesised directly (uniform
    assignment, cell-sorted rows) — kmeans quality is irrelevant to the
    sharded == numpy contract being asserted here."""
    from wise_tpu.parallel.sharded_search import (
        build_sharded_paged,
        sharded_ivf_paged_topk,
        sharded_paged_plan,
    )

    n, d, nlist, nprobe, k = 1_048_576, 64, 1024, 8, 20
    mesh = get_mesh(dp=8)
    # cell-sorted db: cell c owns rows [c*L, (c+1)*L)
    L = n // nlist
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    centroids = rng.standard_normal((nlist, d)).astype(np.float32)
    offsets = (np.arange(nlist + 1, dtype=np.int64) * L)

    import jax.numpy as jnp

    pg = build_sharded_paged(mesh, db, offsets, lpad=256)
    budget, chunk = sharded_paged_plan(pg, nprobe, d)
    vals, rows = sharded_ivf_paged_topk(
        mesh, db[:2], jnp.asarray(centroids), pg,
        nprobe=nprobe, k=k, chunk=chunk, budget=budget,
    )

    # numpy reference over the same probed cells
    cs = db[:2] @ centroids.T
    for i in range(2):
        cells = np.sort(np.argsort(-cs[i], kind="stable")[:nprobe])
        cand_rows = np.concatenate(
            [np.arange(offsets[c], offsets[c + 1]) for c in cells]
        )
        s = db[cand_rows] @ db[i]
        order = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_allclose(
            np.asarray(vals)[i], s[order], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(rows)[i], cand_rows[order])


def test_sharded_dispatch_used_on_multidevice(tmp_path):
    """The public search() routes to the sharded paths when >1 device."""
    import jax

    assert jax.device_count() > 1
    idx, ids, vecs = _make_ivf_index(tmp_path, "IndexIVFFlat", n=400, dim=16)
    idx.config.nprobe = 10_000
    scores, got = idx.search("video", vecs[11][None], topk=5,
                             query_type="vector")
    from wise_tpu.ops.topk import numpy_reference_topk

    ref_vals, ref_rows = numpy_reference_topk(vecs[11][None], vecs, 5)
    np.testing.assert_array_equal(got, ids[ref_rows[0]])
