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
