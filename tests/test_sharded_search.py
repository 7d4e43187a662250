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
