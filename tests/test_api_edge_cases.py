"""API edge cases: projects without thumbnails, empty corpora, bad inputs."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from tests.media_fixtures import make_video
from wise_tpu.api.server import create_server
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.pipeline import extract_features

FID = "wise/random_features/16/edge"


def _serve(pdir):
    srv = create_server(pdir, hostname="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/proj"


def test_no_thumbnails_project(tmp_path):
    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "v.mp4", seconds=4, fps=10)
    pdir = tmp_path / "proj"
    extract_features([media], pdir, image_feature_id=FID,
                     video_feature_id=FID, audio_feature_id=FID,
                     thumbnails=False)
    create_index_main(["--project-dir", str(pdir)])
    srv, base = _serve(pdir)
    try:
        with urllib.request.urlopen(f"{base}/search?q=x&end=3", timeout=30) as r:
            body = json.loads(r.read())
        # no thumbnail rows -> URLs fall back gracefully, search still works
        assert body["video_results"] is not None
        seg = body["video_results"]["unmerged_windows"][0]
        assert seg["thumbnail"].startswith("thumbs/")
        # storyboard of a thumbless video: empty tiles, not an error
        vid = seg["media_id"]
        with urllib.request.urlopen(f"{base}/storyboard/{vid}", timeout=30) as r:
            sb = json.loads(r.read())
        assert sb["tiles"] == []
    finally:
        srv.shutdown()


def test_unknown_routes_and_bad_ids(tmp_path):
    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "v.mp4", seconds=2, fps=10)
    pdir = tmp_path / "proj"
    extract_features([media], pdir, image_feature_id=FID,
                     video_feature_id=FID, audio_feature_id=FID)
    create_index_main(["--project-dir", str(pdir)])
    srv, base = _serve(pdir)
    try:
        for path, code in (
            ("/media/999", 404),
            ("/metadata/999", 404),
            ("/thumbs/99999", 404),
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(base + path, timeout=30)
            assert e.value.code == code
        # too many POST query items -> 400
        url = f"{base}/search?search_in=video&" + "&".join(
            f"text_queries=q{i}" for i in range(6)
        )
        req = urllib.request.Request(url, data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()
