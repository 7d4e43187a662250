import numpy as np
import pytest

from wise_tpu.index import FeatureSearchIndex, SearchIndexFactory
from wise_tpu.index.format import read_index_file, write_index_file
from wise_tpu.ops.topk import numpy_reference_topk
from wise_tpu.store import TarShardStore


def test_widx_format_round_trip(tmp_path):
    path = tmp_path / "x.widx"
    arrays = {
        "ids": np.arange(10, dtype=np.int64),
        "vectors": np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32),
    }
    meta = {"index_type": "IndexFlatIP", "dim": 4, "count": 10}
    write_index_file(path, dict(arrays), meta)
    meta2, arrays2 = read_index_file(path)
    assert meta2 == meta
    for k in arrays:
        np.testing.assert_array_equal(np.asarray(arrays2[k]), arrays[k])


def _build_project_store(tmp_path, n=100, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    fdir = tmp_path / "features"
    fdir.mkdir(parents=True)
    store = TarShardStore("video", fdir)
    store.enable_write(shard_maxcount=32, shard_maxsize=1 << 24)
    ids = np.arange(1, n + 1)
    for i, v in zip(ids, vecs):
        store.add(int(i), v[None])
    store.close()
    asset = {
        "features_dir": str(fdir),
        "index_dir": str(tmp_path / "index"),
    }
    return asset, ids, vecs


def test_flat_index_build_and_search(tmp_path):
    asset, ids, vecs = _build_project_store(tmp_path)
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset
    )
    assert idx.create_index("IndexFlatIP", overwrite=True)
    assert idx.load_index("IndexFlatIP")

    q = vecs[7][None]
    scores, got_ids = idx.search("video", q, topk=5, query_type="vector")
    assert got_ids[0] == ids[7]
    assert scores[0] == pytest.approx(1.0, abs=1e-5)

    ref_vals, ref_rows = numpy_reference_topk(q, vecs, 5)
    np.testing.assert_array_equal(got_ids, ids[ref_rows[0]])
    np.testing.assert_allclose(scores, ref_vals[0], rtol=1e-5, atol=1e-5)


def test_flat_index_text_query_via_random_extractor(tmp_path):
    """Text queries go through the extractor with the per-modality prompt."""
    from wise_tpu.models import FeatureExtractorFactory

    fe = FeatureExtractorFactory("wise/random_features/32/test")
    target = fe.extract_text_features(["This is a photo of a dog"])[0]

    asset, ids, vecs = _build_project_store(tmp_path)
    # overwrite row 3 with the exact embedding of the prompted query text
    fdir = asset["features_dir"]
    store = TarShardStore("video", fdir)
    store.enable_read()
    # rebuild the store with row id 3 = target
    import shutil

    shutil.rmtree(fdir)
    store = TarShardStore("video", fdir)
    store.enable_write(shard_maxcount=32, shard_maxsize=1 << 24)
    for i, v in zip(ids, vecs):
        store.add(int(i), (target[None] if i == 3 else v[None]))
    store.close()

    idx = FeatureSearchIndex("video", "wise/random_features/32/test", asset)
    idx.create_index("IndexFlatIP", overwrite=True)
    idx.load_index("IndexFlatIP")
    scores, got_ids = idx.search("video", "dog", topk=1, query_type="text")
    assert got_ids[0] == 3
    assert scores[0] == pytest.approx(1.0, abs=1e-4)


def test_ivf_index_recall(tmp_path):
    asset, ids, vecs = _build_project_store(tmp_path, n=500, dim=16, seed=1)
    idx = FeatureSearchIndex("video", "wise/random_features/16/test", asset)
    idx.create_index("IndexIVFFlat", overwrite=True)
    idx.load_index("IndexIVFFlat")
    # with nprobe == nlist, IVF must equal exact search
    idx.config.nprobe = 10_000
    q = vecs[123][None]
    scores, got_ids = idx.search("video", q, topk=10, query_type="vector")
    ref_vals, ref_rows = numpy_reference_topk(q, vecs, 10)
    np.testing.assert_array_equal(np.sort(got_ids), np.sort(ids[ref_rows[0]]))
    assert got_ids[0] == ids[123]

    # moderate nprobe: top-1 recall on self-queries should be high
    idx.config.nprobe = 8
    hits = 0
    for i in range(0, 100, 10):
        _, gi = idx.search("video", vecs[i][None], topk=1, query_type="vector")
        hits += int(gi[0] == ids[i])
    assert hits >= 9


def test_factory_routes_media_types(tmp_path):
    asset, _, _ = _build_project_store(tmp_path)
    fi = SearchIndexFactory("video", "wise/random_features/32/test", asset)
    assert isinstance(fi, FeatureSearchIndex)


def test_flat_approx_recall_knob(tmp_path):
    """IndexConfig.flat_approx_recall > 0 routes single-chip flat search
    through flat_topk_approx (jax.lax.approx_max_k — the measured-7.4x
    batch-eval mode, BENCHMARKS.md "large-k variants"). On the CPU test
    backend approx_max_k lowers to an exact sort, so results must EQUAL
    the exact path — this pins the plumbing, the TPU recall/speed is
    pinned by the hardware bench."""
    from wise_tpu.config import IndexConfig

    asset, ids, vecs = _build_project_store(tmp_path)
    cfg = IndexConfig()
    cfg.flat_approx_recall = 0.95
    idx = FeatureSearchIndex(
        "video", "wise/random_features/32/test", asset, config=cfg
    )
    assert idx.create_index("IndexFlatIP", overwrite=True)
    assert idx.load_index("IndexFlatIP")
    q = vecs[3][None]
    scores, got_ids = idx.search("video", q, topk=7, query_type="vector")
    ref_vals, ref_rows = numpy_reference_topk(q, vecs, 7)
    np.testing.assert_array_equal(got_ids, ids[ref_rows[0]])
    np.testing.assert_allclose(scores, ref_vals[0], rtol=1e-5, atol=1e-5)
