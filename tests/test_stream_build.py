"""Streaming (> RAM) index build == in-memory build, for all index types."""

import dataclasses

import numpy as np
import pytest

from tests.test_index import _build_project_store
from wise_tpu.config import IndexConfig
from wise_tpu.index import FeatureSearchIndex
from wise_tpu.index.format import read_index_file


def _build_both(tmp_path, index_type, n=600, dim=32, **cfg_kw):
    asset, ids, vecs = _build_project_store(tmp_path, n=n, dim=dim, seed=4)
    out = {}
    for label, threshold in (("mem", 1 << 40), ("stream", 0)):
        cfg = IndexConfig(stream_build_threshold_bytes=threshold, **cfg_kw)
        idx = FeatureSearchIndex(
            "video", f"wise/random_features/{dim}/test", asset, config=cfg
        )
        assert idx.create_index(index_type, overwrite=True)
        path = idx.index_path(index_type)
        out[label] = (path.read_bytes(), read_index_file(path))
        path.rename(path.with_suffix(f".{label}"))
    return asset, vecs, out


@pytest.mark.parametrize("index_type", ["IndexFlatIP", "IndexIVFFlat"])
def test_streaming_build_is_byte_identical(tmp_path, index_type):
    _, _, out = _build_both(tmp_path, index_type)
    assert out["stream"][0] == out["mem"][0]


def test_streaming_ivfpq_matches_memory(tmp_path):
    _, _, out = _build_both(
        tmp_path, "IndexIVFPQ", pq_m=8, pq_train_samples=600
    )
    mem_meta, mem_arrays = out["mem"][1]
    st_meta, st_arrays = out["stream"][1]
    assert st_meta == mem_meta
    assert set(st_arrays) == set(mem_arrays)
    for name in mem_arrays:
        np.testing.assert_array_equal(
            np.asarray(st_arrays[name]), np.asarray(mem_arrays[name]),
            err_msg=name,
        )


def test_streaming_ivf_search_end_to_end(tmp_path):
    """Search through a streamed IVF index returns the exact neighbours."""
    from wise_tpu.ops.topk import numpy_reference_topk

    asset, ids, vecs = _build_project_store(tmp_path, n=500, dim=16, seed=9)
    cfg = IndexConfig(stream_build_threshold_bytes=0, nprobe=10_000)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/16/test", asset, config=cfg
    )
    assert idx.create_index("IndexIVFFlat", overwrite=True)
    assert idx.load_index("IndexIVFFlat")
    q = vecs[7][None]
    scores, got = idx.search("video", q, topk=5, query_type="vector")
    ref_vals, ref_rows = numpy_reference_topk(q, vecs, 5)
    np.testing.assert_array_equal(got, ids[ref_rows[0]])
    np.testing.assert_allclose(scores, ref_vals[0], rtol=1e-5, atol=1e-5)
