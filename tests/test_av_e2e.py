"""True AV files (audio+video in one container) through the full pipeline —
the reference's primary use case (video files with soundtracks)."""

import json
import threading
import urllib.request

import pytest

from tests.media_fixtures import make_av
from wise_tpu import db as wdb
from wise_tpu.api.server import create_server
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.data_models import MediaType
from wise_tpu.io.decode import get_media_type
from wise_tpu.pipeline import extract_features
from wise_tpu.project import WiseProject

FEATURE_ID = "wise/random_features/32/av"


def test_media_type_av(tmp_path):
    f = tmp_path / "clip.avi"
    make_av(f, seconds=4, fps=10)
    assert get_media_type(f) == MediaType.AV


@pytest.fixture(scope="module")
def av_project(tmp_path_factory):
    media = tmp_path_factory.mktemp("avmedia")
    make_av(media / "clip1.avi", seconds=8, fps=10, freq=440.0)
    make_av(media / "clip2.avi", seconds=8, fps=10, freq=880.0)
    pdir = tmp_path_factory.mktemp("avproj") / "proj"
    stats = extract_features(
        [media], pdir, image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID,
        batch_size=16,
    )
    # 2 clips x 8 s: 16 video frames and 2 audio segments each
    assert stats.num_video_vectors == 32
    assert stats.num_audio_vectors == 4
    create_index_main(["--project-dir", str(pdir)])
    return pdir


def test_av_vectors_share_media_row(av_project):
    conn = wdb.connect(WiseProject(av_project).db_path, readonly=True)
    rows = conn.execute(
        "SELECT media_type, COUNT(*) FROM media GROUP BY media_type"
    ).fetchall()
    assert [tuple(r) for r in rows] == [("AV", 2)]
    # both modalities reference the same media ids
    v = conn.execute(
        "SELECT DISTINCT media_id FROM vectors WHERE modality='VIDEO'"
    ).fetchall()
    a = conn.execute(
        "SELECT DISTINCT media_id FROM vectors WHERE modality='AUDIO'"
    ).fetchall()
    assert {r[0] for r in v} == {r[0] for r in a}
    # audio segments carry [t, t+4] ranges
    seg = conn.execute(
        "SELECT timestamp, end_timestamp FROM vectors WHERE modality='AUDIO' "
        "ORDER BY id LIMIT 2"
    ).fetchall()
    assert [tuple(r) for r in seg] == [(0.0, 4.0), (4.0, 8.0)]


def test_api_av_search_returns_video_audio_results(av_project):
    server = create_server(av_project, hostname="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        url = (
            f"http://127.0.0.1:{port}/proj/search?search_in=av"
            f"&text_queries=engine+noise&end=4"
        )
        req = urllib.request.Request(url, data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        var = body["video_audio_results"]
        assert var is not None
        assert len(var["unmerged_windows"]) == 4
        seg = var["unmerged_windows"][0]
        assert seg["te"] - seg["ts"] == pytest.approx(4.0)
        assert seg["media_id"] in var["videos"]
    finally:
        server.shutdown()
