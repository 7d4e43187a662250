"""Pallas fused scan+top-k kernel vs numpy reference (interpret mode on CPU;
the same kernel compiles natively on TPU and is benchmarked in bench.py)."""

import numpy as np
import pytest

from wise_tpu.ops.pallas_topk import pallas_topk
from wise_tpu.ops.topk import numpy_reference_topk, pad_rows


@pytest.mark.parametrize("n,d,q,k,group", [
    (1000, 64, 3, 10, 256),
    (512, 128, 1, 100, 256),
    (300, 32, 2, 7, 128),      # padding within last group
    (64, 16, 1, 64, 64),       # k == n == group
])
def test_matches_numpy(rng, n, d, q, k, group):
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    padded = pad_rows(db, group)
    vals, idx = pallas_topk(
        queries, padded, n_valid=n, k=k, group=group, interpret=True
    )
    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_tie_break(rng):
    d = 8
    row = rng.standard_normal(d).astype(np.float32)
    db = np.stack([row] * 6 + [rng.standard_normal(d).astype(np.float32)] * 2)
    padded = pad_rows(db, 4)
    vals, idx = pallas_topk(
        row[None], padded, n_valid=8, k=6, group=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(6))


@pytest.mark.parametrize("n,d,q,k,group", [
    (1000, 64, 3, 10, 256),
    (512, 128, 1, 100, 256),
    (300, 32, 2, 7, 128),      # padding within last group
    (2048, 32, 4, 128, 256),   # k == k_pad exactly
])
def test_threshold_matches_numpy(rng, n, d, q, k, group):
    from wise_tpu.ops.pallas_topk import pallas_topk_threshold

    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    padded = pad_rows(db, group)
    vals, idx = pallas_topk_threshold(
        queries, padded, n_valid=n, k=k, group=group, interpret=True
    )
    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_threshold_bf16_storage(rng):
    from wise_tpu.ops.pallas_topk import pallas_topk_threshold

    db = rng.standard_normal((500, 32)).astype(np.float32)
    q = db[123][None]
    import jax.numpy as jnp

    padded = jnp.asarray(pad_rows(db, 128)).astype(jnp.bfloat16)
    vals, idx = pallas_topk_threshold(
        q, padded, n_valid=500, k=5, group=128, interpret=True
    )
    assert int(np.asarray(idx)[0, 0]) == 123  # self-match survives bf16
