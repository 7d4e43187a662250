"""Failure semantics: undecodable and mid-stream-corrupt files are skipped
best-effort, never crashing the pipeline (reference behaviour:
dataset.py:470-496 exclusion + logging; extended here to mid-decode
failures, which the reference never exercises)."""

import numpy as np
import pytest

from tests.media_fixtures import make_av, make_video
from wise_tpu import db as wdb
from wise_tpu.pipeline import extract_features
from wise_tpu.project import WiseProject

FEATURE_ID = "wise/random_features/16/fault"


def test_truncated_file_mid_decode(tmp_path):
    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "good.mp4", seconds=4, fps=10)
    # an AVI cut off mid-movi: header probes fine, decode hits EOF early
    make_av(media / "cut.avi", seconds=8, fps=10)
    data = (media / "cut.avi").read_bytes()
    (media / "cut.avi").write_bytes(data[: len(data) // 2])

    pdir = tmp_path / "proj"
    stats = extract_features(
        [media], pdir, image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
    )
    # the good file must be fully ingested regardless of the corrupt one
    conn = wdb.connect(WiseProject(pdir).db_path, readonly=True)
    good_id = conn.execute(
        "SELECT id FROM media WHERE path='good.mp4'"
    ).fetchone()[0]
    n_good = conn.execute(
        "SELECT COUNT(*) FROM vectors WHERE media_id=?", (good_id,)
    ).fetchone()[0]
    assert n_good == 8
    assert stats.num_video_vectors >= 8  # partial vectors from cut.avi are ok


def test_unreadable_file_skipped(tmp_path):
    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "good.mp4", seconds=4, fps=10)
    (media / "noise.avi").write_bytes(b"RIFF\x10\x00\x00\x00AVI LIST")
    pdir = tmp_path / "proj"
    stats = extract_features(
        [media], pdir, image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
    )
    assert stats.num_unknown_files == 1
    assert stats.num_video_vectors == 8
