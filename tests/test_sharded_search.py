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


def test_sharded_small_mesh(rng):
    mesh = get_mesh(dp=4, devices=jax.devices()[:4])
    db = rng.standard_normal((64, 16)).astype(np.float32)
    queries = rng.standard_normal((1, 16)).astype(np.float32)
    db_sharded, n_total = pad_and_shard_db(mesh, db)
    vals, idx = sharded_scan_topk(mesh, queries, db_sharded, n_total, 8)
    ref_vals, ref_idx = numpy_reference_topk(queries, db, 8)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)
