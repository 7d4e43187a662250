"""Ingestion resumability: re-running extract on the same/extended corpus
skips already-embedded files and appends new shards (new capability over the
reference, which refuses to extend a project — extract-features.py:253-257)."""

import numpy as np

from tests.media_fixtures import make_video, make_wav
from wise_tpu import db as wdb
from wise_tpu.pipeline import extract_features
from wise_tpu.project import WiseProject
from wise_tpu.store import TarShardStore

FEATURE_ID = "wise/random_features/32/resume"


def test_rerun_is_idempotent(tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    make_video(media / "v1.mp4", seconds=4, fps=10)
    pdir = tmp_path / "proj"

    s1 = extract_features(
        [media], pdir, video_feature_id=FEATURE_ID,
        image_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
        batch_size=8,
    )
    assert s1.num_video_vectors == 8

    s2 = extract_features(
        [media], pdir, video_feature_id=FEATURE_ID,
        image_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
        batch_size=8,
    )
    assert s2.num_video_vectors == 0  # nothing re-embedded
    assert s2.num_files == 1

    conn = wdb.connect(WiseProject(pdir).db_path, readonly=True)
    assert conn.execute("SELECT COUNT(*) FROM media").fetchone()[0] == 1
    assert conn.execute("SELECT COUNT(*) FROM vectors").fetchone()[0] == 8
    assert (
        conn.execute("SELECT COUNT(*) FROM source_collections").fetchone()[0]
        == 1
    )


def test_extend_project_appends(tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    make_video(media / "v1.mp4", seconds=4, fps=10)
    pdir = tmp_path / "proj"
    extract_features(
        [media], pdir, video_feature_id=FEATURE_ID,
        image_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
        batch_size=8, shard_maxcount=4,
    )
    # add a new file and re-run
    make_video(media / "v2.mp4", seconds=4, fps=10, size=(32, 32))
    s2 = extract_features(
        [media], pdir, video_feature_id=FEATURE_ID,
        image_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
        batch_size=8, shard_maxcount=4,
    )
    assert s2.num_video_vectors == 8  # only the new file embedded

    proj = WiseProject(pdir)
    store = TarShardStore("video", proj.features_dir(FEATURE_ID))
    store.enable_read()
    assert store.feature_count == 16
    ids = [i for i, _ in store]
    assert ids == sorted(ids)  # appended shards keep global id order
    conn = wdb.connect(proj.db_path, readonly=True)
    assert conn.execute("SELECT COUNT(*) FROM vectors").fetchone()[0] == 16
