import numpy as np

from tests.media_fixtures import make_video
from wise_tpu import db as wdb
from wise_tpu.pipeline import extract_features
from wise_tpu.pipeline.shots import detect_shots, detect_shots_for_project
from wise_tpu.project import WiseProject


def _synthetic_shots(n_shots=3, frames_per_shot=10, size=24):
    rng = np.random.default_rng(0)
    frames = []
    for s in range(n_shots):
        base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for f in range(frames_per_shot):
            jitter = rng.integers(-5, 5, base.shape).astype(np.int16)
            frames.append(np.clip(base.astype(np.int16) + jitter, 0, 255).astype(np.uint8))
    pts = np.arange(len(frames)) * 0.5
    return np.stack(frames), pts


def test_detect_shots_synthetic():
    frames, pts = _synthetic_shots(3, 10)
    spans = detect_shots(frames, pts, threshold=0.15)
    assert len(spans) == 3
    np.testing.assert_allclose(spans[0], (0.0, 4.5))
    np.testing.assert_allclose(spans[1], (5.0, 9.5))
    np.testing.assert_allclose(spans[2], (10.0, 14.5))


def test_single_shot_video():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    frames = np.stack([base] * 8)
    pts = np.arange(8) * 0.5
    spans = detect_shots(frames, pts)
    assert spans == [(0.0, 3.5)]


def test_detect_shots_for_project(tmp_path):
    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "v.mp4", seconds=4, fps=10)
    pdir = tmp_path / "p"
    fid = "wise/random_features/16/shots"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    n = detect_shots_for_project(pdir)
    assert n >= 1
    conn = wdb.connect(WiseProject(pdir).db_path, readonly=True)
    rows = conn.execute("SELECT * FROM shots").fetchall()
    assert len(rows) == n
    assert rows[0]["start_time"] == 0.0
