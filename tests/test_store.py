"""Feature store tests.

Modelled on the reference's hermetic store suite
(/root/reference/src/feature/store/test_feature_store.py:11-110):
round-trip, sharding behaviour, batch iteration, and read-order determinism.
"""

import tarfile

import numpy as np
import pytest

from wise_tpu.store import (
    FeatureStoreFactory,
    FeatureStoreType,
    NpzShardStore,
    TarShardStore,
)

DIM = 16


def _write_vectors(store, ids, dim=DIM):
    store.enable_write(shard_maxcount=3, shard_maxsize=10 * 1024 * 1024)
    vecs = {}
    for i in ids:
        v = np.full((1, dim), float(i), dtype=np.float32)
        store.add(i, v)
        vecs[i] = v
    store.close()
    return vecs


@pytest.mark.parametrize("store_cls", [TarShardStore, NpzShardStore])
def test_round_trip_and_order(tmp_path, store_cls):
    ids = [0, 3, 6, 7, 8]
    store = store_cls("video", tmp_path)
    vecs = _write_vectors(store, ids)

    reader = store_cls("video", tmp_path)
    reader.enable_read()
    assert reader.feature_count == len(ids)
    assert reader.feature_dim == DIM

    got = list(reader)
    assert [i for i, _ in got] == ids  # insertion order preserved
    for i, v in got:
        np.testing.assert_array_equal(np.atleast_2d(v), vecs[i])


@pytest.mark.parametrize("store_cls", [TarShardStore, NpzShardStore])
def test_sharding(tmp_path, store_cls):
    ids = list(range(7))
    store = store_cls("audio", tmp_path)
    _write_vectors(store, ids)  # maxcount=3 -> 3 shards (3,3,1)
    ext = store_cls.EXTENSION
    shards = sorted(tmp_path.glob(f"audio-*.{ext}"))
    assert len(shards) == 3


@pytest.mark.parametrize("store_cls", [TarShardStore, NpzShardStore])
def test_iter_batch(tmp_path, store_cls):
    ids = list(range(10))
    store = store_cls("image", tmp_path)
    _write_vectors(store, ids)
    reader = store_cls("image", tmp_path)
    reader.enable_read()
    batches = list(reader.iter_batch(batch_size=4))
    assert [len(b[0]) for b in batches] == [4, 4, 2]
    all_ids = [i for b in batches for i in b[0]]
    assert all_ids == ids
    assert batches[0][1].shape == (4, DIM)


def test_factory_infers_type(tmp_path):
    store = FeatureStoreFactory.create_store(
        FeatureStoreType.WEBDATASET, "video", tmp_path
    )
    _write_vectors(store, [1, 2])
    loaded = FeatureStoreFactory.load_store("video", tmp_path)
    assert isinstance(loaded, TarShardStore)
    loaded.enable_read()
    assert loaded.feature_count == 2


def test_tar_layout_webdataset_compatible(tmp_path):
    """Member naming must match webdataset: <%010d>.features.pyd, np.save payload."""
    store = TarShardStore("video", tmp_path)
    store.enable_write(shard_maxcount=10, shard_maxsize=10 * 1024 * 1024)
    store.add(42, np.ones((1, 4), dtype=np.float32))
    store.close()
    with tarfile.open(tmp_path / "video-000000.tar") as tf:
        names = [m.name for m in tf if m.isreg()]
    assert names == ["0000000042.features.pyd"]
