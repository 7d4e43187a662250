import numpy as np
import pytest

from wise_tpu.config import WiseConfig
from wise_tpu.project import WiseProject
from wise_tpu.store import TarShardStore


def test_create_and_discover(tmp_path):
    proj = WiseProject(tmp_path / "p", create_project=True)
    feid = "wise/random_features/512/test"
    fdir = proj.create_features_dir(feid)
    assert fdir == tmp_path / "p/store/wise/random_features/512/test/features"

    store = TarShardStore("video", fdir)
    store.enable_write(shard_maxcount=10, shard_maxsize=1 << 20)
    store.add(0, np.zeros((1, 4), dtype=np.float32))
    store.close()

    assets = proj.discover_assets()
    assert feid in assets["video"]
    entry = assets["video"][feid]
    assert entry["features_files"] == ["video-000000.tar"]
    assert entry["index_files"] == []
    assert assets["metadata"] == {}


def test_missing_project_raises(tmp_path):
    with pytest.raises(ValueError):
        WiseProject(tmp_path / "nope", create_project=False)


def test_config_round_trip(tmp_path):
    proj = WiseProject(tmp_path / "p", create_project=True)
    cfg = WiseConfig()
    cfg.video.frame_rate = 4.0
    cfg.search.query_blocklist = ("bad",)
    proj.save_config(cfg)
    loaded = proj.load_config()
    assert loaded.video.frame_rate == 4.0
    assert loaded.search.query_blocklist == ("bad",)
    assert loaded.audio.sampling_rate == 48_000
