"""int8 HBM storage for the flat index: device int8 candidate scan + host
f32 rerank.

Contract (see config.py storage_dtype): returned SCORES are true f32
inner products of the returned rows (the rerank re-scores candidates from
the memmapped store), and the ranking equals the full f32 scan whenever
the true top-k survives the int8 candidate stage. On well-separated data
that is always; on adversarial data where hundreds of rows fall within the
int8 noise (~1e-3 for unit vectors) of the k-th score, ranks deep in the
list can swap with just-missed rows — strictly better than bf16 storage,
which perturbs every returned score and tolerates the same swaps."""

import numpy as np

from wise_tpu.ops.topk import (
    int8_candidates,
    numpy_reference_topk,
    pad_rows,
    quantize_rows_int8,
    rerank_exact_f32,
)


def _exact_int8_topk(q, db, k, mult=4, group=256):
    import jax.numpy as jnp

    padded = pad_rows(db, group)
    codes, scales = quantize_rows_int8(padded)
    n = db.shape[0]
    kc = min(mult * k, n)
    _, cand = int8_candidates(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        n_valid=n, kc=kc, k=min(k, n), group=group,
    )
    return rerank_exact_f32(q, np.asarray(cand), db, min(k, n), n_valid=n)


def test_quantize_roundtrip(rng):
    db = rng.standard_normal((100, 32)).astype(np.float32)
    codes, scales = quantize_rows_int8(db)
    back = codes.astype(np.float32) * scales[:, None]
    assert np.abs(back - db).max() <= scales.max() / 2 + 1e-7
    # zero row -> scale 0, codes 0
    db[3] = 0
    codes, scales = quantize_rows_int8(db)
    assert scales[3] == 0 and not codes[3].any()


def test_int8_matches_f32_exactly(rng):
    for n, d, k in ((2000, 64, 20), (500, 32, 50), (64, 16, 64)):
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = rng.standard_normal((3, d)).astype(np.float32)
        vals, rows = _exact_int8_topk(q, db, k)
        ref_vals, ref_rows = numpy_reference_topk(q, db, k)
        np.testing.assert_array_equal(rows, ref_rows)
        # scores are true f32 dots; gemv-vs-gemm BLAS accumulation differs
        # in the last ulp
        np.testing.assert_allclose(vals, ref_vals, rtol=3e-5)


def test_int8_clustered_data(rng):
    """Clustered data (near-duplicate scores) is the adversarial case for a
    quantized candidate scan — the margin between candidate kc and true k
    must absorb the int8 error."""
    centers = rng.standard_normal((20, 48)).astype(np.float32)
    db = (centers[rng.integers(0, 20, 3000)]
          + 0.05 * rng.standard_normal((3000, 48))).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, 3000, 4)] + 0.01 * rng.standard_normal(
        (4, 48)
    ).astype(np.float32)
    q = q.astype(np.float32)
    k = 25
    vals, rows = _exact_int8_topk(q, db, k=k)
    ref_vals, ref_rows = numpy_reference_topk(q, db, k)
    for i in range(len(q)):
        # top-k set: >= 0.9 like the bf16-storage contract (in practice
        # 24-25/25 here; misses are just-outside-k rows within int8 noise)
        assert len(set(rows[i]) & set(ref_rows[i])) >= int(0.9 * k)
        # returned scores are the TRUE f32 scores of the returned rows
        true = db[rows[i]] @ q[i]
        np.testing.assert_allclose(vals[i], true, rtol=3e-5)
    # any rank mismatch involves scores within the int8 noise bound
    assert np.abs(vals - ref_vals).max() < 2.5e-4


def test_int8_tie_break(rng):
    """Exact duplicate rows: the rerank must prefer lower row indices like
    faiss (numpy_reference_topk pins that contract)."""
    d = 16
    base = rng.standard_normal((10, d)).astype(np.float32)
    db = np.concatenate([base, base, base])  # every row appears 3x
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[[4]] + 0
    vals, rows = _exact_int8_topk(q, db, k=9, mult=8)
    ref_vals, ref_rows = numpy_reference_topk(q, db, 9)
    np.testing.assert_array_equal(rows, ref_rows)


def test_sharded_int8_candidates_match_numpy(rng):
    """8-device CPU mesh: sharded int8 candidate scan == single-device op ==
    covers the exact top-k (same contract as the scan shard tests)."""
    import jax
    import jax.numpy as jnp

    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs the multi-device CPU mesh")
    from wise_tpu.parallel.mesh import get_mesh
    from wise_tpu.parallel.sharded_search import (
        pad_and_shard_db,
        sharded_int8_candidates,
    )

    n, d, k = 3000, 64, 20
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((2, d)).astype(np.float32)
    mesh = get_mesh(dp=jax.device_count())
    codes_h, scales_h = quantize_rows_int8(db)
    codes, _ = pad_and_shard_db(mesh, codes_h)
    from jax.sharding import NamedSharding, PartitionSpec as P

    scales = jax.device_put(
        np.pad(scales_h, (0, codes.shape[0] - n)),
        NamedSharding(mesh, P("dp")),
    )
    kc = 4 * k
    _, cand = sharded_int8_candidates(mesh, q, codes, scales, n, kc)
    vals, rows = rerank_exact_f32(q, cand, db, k, n_valid=n)
    ref_vals, ref_rows = numpy_reference_topk(q, db, k)
    np.testing.assert_array_equal(rows, ref_rows)
    np.testing.assert_allclose(vals, ref_vals, rtol=3e-5)


def test_index_config_int8(tmp_path, rng):
    from tests.test_index import _build_project_store
    from wise_tpu.config import IndexConfig
    from wise_tpu.index import FeatureSearchIndex

    asset, ids, vecs = _build_project_store(tmp_path)
    cfg = IndexConfig(storage_dtype="int8")
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    idx.create_index("IndexFlatIP", overwrite=True)
    idx.load_index("IndexFlatIP")
    q = vecs[7][None]
    scores, got_ids = idx.search("video", q, topk=5, query_type="vector")
    assert got_ids[0] == ids[7]
    assert abs(scores[0] - 1.0) < 1e-5  # rerank is true f32, not quantized

    # whole result set identical to the f32 configuration
    idx32 = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=IndexConfig()
    )
    idx32.load_index("IndexFlatIP")
    s32, ids32 = idx32.search("video", q, topk=5, query_type="vector")
    np.testing.assert_array_equal(got_ids, ids32)
    np.testing.assert_allclose(scores, s32, rtol=1e-6)


def test_int8_bf16dot_variant_identical():
    """The convert-on-read bf16-dot probe variant (BENCHMARKS.md round-5
    int8 attribution — measured flat on hardware, kept as a documented
    probe) must stay byte-identical in candidate rows and scores: int8
    values are exact in bf16, every product fits f32 exactly, and a
    512-term integer-magnitude sum is exact in f32."""
    import jax.numpy as jnp
    import numpy as np

    from wise_tpu.ops.topk import (
        int8_candidates,
        int8_candidates_bf16dot,
        quantize_rows_int8,
    )

    rng = np.random.default_rng(7)
    db = rng.standard_normal((8192, 512)).astype(np.float32)
    codes, scales = quantize_rows_int8(db)
    q = rng.standard_normal((4, 512)).astype(np.float32)
    v1, r1 = int8_candidates(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        n_valid=8000, kc=80, k=20,
    )
    v2, r2 = int8_candidates_bf16dot(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        n_valid=8000, kc=80, k=20,
    )
    assert (np.asarray(r1) == np.asarray(r2)).all()
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
