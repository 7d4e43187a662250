"""bf16 HBM storage option for the flat index."""

import numpy as np

import jax.numpy as jnp

from wise_tpu.ops.topk import hier_topk, numpy_reference_topk, pad_rows


def test_bf16_db_high_recall(rng):
    n, d, k = 2000, 64, 20
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((2, d)).astype(np.float32)
    padded = pad_rows(db, 256)
    db16 = jnp.asarray(padded).astype(jnp.bfloat16)
    vals, idx = hier_topk(jnp.asarray(q), db16, n_valid=n, k=k, group=256)
    ref_vals, ref_idx = numpy_reference_topk(q, db, k)
    # bf16 rounding can swap near-equal neighbours; require high overlap and
    # close scores
    for r in range(2):
        overlap = len(set(np.asarray(idx)[r]) & set(ref_idx[r])) / k
        assert overlap >= 0.9
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=2e-2)


def test_index_config_bf16(tmp_path, rng):
    from tests.test_index import _build_project_store
    from wise_tpu.config import IndexConfig
    from wise_tpu.index import FeatureSearchIndex

    asset, ids, vecs = _build_project_store(tmp_path)
    cfg = IndexConfig(storage_dtype="bfloat16")
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    idx.create_index("IndexFlatIP", overwrite=True)
    idx.load_index("IndexFlatIP")
    q = vecs[7][None]
    scores, got_ids = idx.search("video", q, topk=5, query_type="vector")
    assert got_ids[0] == ids[7]
    assert abs(scores[0] - 1.0) < 1e-2
    assert idx._ensure_device_db().dtype == jnp.bfloat16
