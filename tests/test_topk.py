import numpy as np
import pytest

from wise_tpu.ops.topk import (
    exact_topk,
    hier_topk,
    numpy_reference_topk,
    pad_rows,
    two_stage_topk,
)


@pytest.mark.parametrize("n,d,q,k,block", [
    (1000, 64, 3, 10, 256),
    (100, 32, 1, 100, 4096),     # k == n
    (513, 128, 2, 7, 128),       # ragged tail
    (8, 16, 2, 20, 64),          # k > n
])
def test_matches_numpy(rng, n, d, q, k, block):
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx = exact_topk(queries, db, k, block_rows=block)
    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    k_eff = min(k, n)
    assert vals.shape == (q, k_eff)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)


def test_tie_break_prefers_lower_index(rng):
    d = 8
    row = rng.standard_normal(d).astype(np.float32)
    db = np.stack([row] * 5 + [rng.standard_normal(d).astype(np.float32)])
    q = row[None]
    vals, idx = exact_topk(q, db, 5, block_rows=8)
    # 5 identical rows -> indices 0..4 in order
    np.testing.assert_array_equal(idx[0], np.arange(5))


@pytest.mark.parametrize("n,d,q,k,group", [
    (1000, 64, 3, 10, 128),
    (100, 32, 1, 100, 64),      # k > group -> flat fallback
    (513, 16, 2, 7, 256),       # heavy padding
    (50, 8, 1, 50, 64),         # k == n < group
])
def test_hier_topk_matches_numpy(rng, n, d, q, k, group):
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    padded = pad_rows(db, group)
    assert padded.shape[0] % group == 0
    vals, idx = hier_topk(queries, padded, n_valid=n, k=k, group=group)
    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


@pytest.mark.parametrize("n,d,q,k,group", [
    (1000, 64, 3, 10, 128),
    (513, 16, 2, 7, 256),
    (50, 8, 1, 50, 64),
    (3000, 32, 2, 100, 64),    # k > num_blocks contributions spread thin
    (64, 8, 1, 64, 8),         # k == n, many tiny blocks
])
def test_two_stage_matches_numpy(rng, n, d, q, k, group):
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    padded = pad_rows(db, group)
    vals, idx = two_stage_topk(queries, padded, n_valid=n, k=k, group=group)
    ref_vals, ref_idx = numpy_reference_topk(queries, db, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_two_stage_cross_block_ties(rng):
    """Equal scores in different blocks must come out in ascending row order,
    even when a later block has a higher max."""
    d = 8
    tie_row = rng.standard_normal(d).astype(np.float32)
    big_row = tie_row * 2.0
    rows = []
    # block 0: tie at row 1; block 1: big max at row 4 + tie at row 5
    filler = (-np.abs(rng.standard_normal((1, d)))).astype(np.float32)
    rows = np.concatenate(
        [filler, tie_row[None], filler, filler, big_row[None], tie_row[None],
         filler, filler]
    )
    padded = pad_rows(rows, 4)  # blocks of 4: rows 0-3, 4-7
    q = tie_row[None]
    vals, idx = two_stage_topk(q, padded, n_valid=8, k=3, group=4)
    ref_vals, ref_idx = numpy_reference_topk(q, rows, 3)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    assert list(np.asarray(idx)[0][:3]) == [4, 1, 5]  # big first, then tie rows asc


def test_hier_topk_tie_break(rng):
    d = 8
    row = rng.standard_normal(d).astype(np.float32)
    db = np.stack([row] * 5 + [rng.standard_normal(d).astype(np.float32)] * 3)
    padded = pad_rows(db, 4)  # ties split across groups
    vals, idx = hier_topk(row[None], padded, n_valid=8, k=5, group=4)
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(5))


def test_scores_are_f32_inner_products(rng):
    db = rng.standard_normal((50, 16)).astype(np.float32)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    vals, idx = exact_topk(q, db, 1)
    expect = float(q[0] @ db[idx[0, 0]])
    assert abs(float(vals[0, 0]) - expect) < 1e-5


def test_flat_topk_dispatcher_consistency(rng):
    """Both dispatcher branches (two_stage for small Q, hier for large) give
    identical exact results."""
    from wise_tpu.ops.topk import flat_topk

    n, d, k = 700, 32, 9
    db = rng.standard_normal((n, d)).astype(np.float32)
    padded = pad_rows(db, 128)
    q_small = rng.standard_normal((2, d)).astype(np.float32)
    q_large = np.concatenate([q_small] * 4)  # 8 queries -> hier branch
    ref_vals, ref_idx = numpy_reference_topk(q_small, db, k)
    v1, i1 = flat_topk(q_small, padded, n_valid=n, k=k, group=128)
    v2, i2 = flat_topk(q_large, padded, n_valid=n, k=k, group=128)
    np.testing.assert_array_equal(np.asarray(i1), ref_idx)
    np.testing.assert_array_equal(np.asarray(i2)[:2], ref_idx)
    np.testing.assert_allclose(np.asarray(v1), ref_vals, rtol=1e-5, atol=1e-5)
