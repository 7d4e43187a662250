"""REST API integration tests: live stdlib server over real HTTP."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video, make_wav
from wise_tpu.api.server import create_server, parse_multipart, parse_range
from wise_tpu.pipeline import extract_features
from wise_tpu.cli.create_index import main as create_index_main

FEATURE_ID = "wise/random_features/48/api"


@pytest.fixture(scope="module")
def served_project(tmp_path_factory):
    media = tmp_path_factory.mktemp("apimedia")
    make_video(media / "v1.mp4", seconds=8, fps=10)
    make_video(media / "v2.mp4", seconds=4, fps=10)
    make_wav(media / "a1.wav", seconds=8.0, rate=48000)
    make_image(media / "i1.png", value=77)
    pdir = tmp_path_factory.mktemp("apiproj") / "proj"
    extract_features(
        [media], pdir,
        image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID,
        batch_size=16,
    )
    create_index_main(["--project-dir", str(pdir)])

    from wise_tpu.project import WiseProject

    proj = WiseProject(pdir)
    cfg = proj.load_config()
    cfg.search.query_blocklist = ("verboten",)
    server = create_server(pdir, hostname="127.0.0.1", port=0, config=cfg)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}/proj", media
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_info(served_project):
    base, _ = served_project
    status, body = _get(f"{base}/info")
    assert status == 200
    assert body["num_media_files"] == 4
    assert body["num_vectors"] == 24 + 2 + 1
    assert set(body["media_types"]) == {"audio", "image", "video"}
    assert body["total_duration"] > 0


def test_get_search_shape(served_project):
    base, _ = served_project
    status, body = _get(f"{base}/search?q=dog&end=10")
    assert status == 200
    assert body["time"] >= 0
    vr = body["video_results"]
    assert vr is not None
    assert len(vr["unmerged_windows"]) > 0
    seg = vr["unmerged_windows"][0]
    assert {"vector_id", "media_id", "ts", "te", "link", "distance",
            "thumbnail", "thumbnail_score"} <= set(seg)
    # distances rounded to 3 decimals
    assert round(seg["distance"], 3) == seg["distance"]
    vid = seg["media_id"]
    assert vid in vr["videos"]
    info = vr["videos"][vid]
    assert info["timeline_hover_thumbnails"] == f"storyboard/{vid}"
    # inline thumbnails are data URIs
    assert seg["thumbnail"].startswith("data:image/jpeg")
    # shot merging present
    assert len(vr["merged_windows"]) >= 1
    assert vr["merged_windows"][0]["te"] >= vr["merged_windows"][0]["ts"]


def test_get_search_blocklist(served_project):
    base, _ = served_project
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/search?q=verboten")
    assert e.value.code == 403


def test_get_search_missing_query(served_project):
    base, _ = served_project
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/search")
    assert e.value.code == 400


def test_post_search_multimodal(served_project):
    base, _ = served_project
    url = f"{base}/search?search_in=video&text_queries=sunny+beach&end=5"
    req = urllib.request.Request(url, data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        body = json.loads(r.read())
    assert body["video_results"] is not None

    # positive + negative text fuses to a different ranking than positive only
    url2 = (
        f"{base}/search?search_in=video&text_queries=sunny+beach"
        f"&negative_text_queries=rain&end=5"
    )
    req2 = urllib.request.Request(url2, data=b"", method="POST")
    with urllib.request.urlopen(req2, timeout=30) as r:
        body2 = json.loads(r.read())
    d1 = [s["distance"] for s in body["video_results"]["unmerged_windows"]]
    d2 = [s["distance"] for s in body2["video_results"]["unmerged_windows"]]
    assert d1 != d2


def test_post_search_av_stream(served_project):
    base, _ = served_project
    url = f"{base}/search?search_in=audio&text_queries=birds&end=5"
    req = urllib.request.Request(url, data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        body = json.loads(r.read())
    assert body["audio_results"] is not None
    assert len(body["audio_results"]["unmerged_windows"]) > 0


def test_media_range_streaming(served_project):
    base, media = served_project
    # media id 4 == v1.mp4? find by metadata: media/{id} probe a couple ids
    full = None
    for mid in range(1, 5):
        try:
            req = urllib.request.Request(f"{base}/media/{mid}")
            with urllib.request.urlopen(req, timeout=30) as r:
                data = r.read()
                if r.headers["Content-Type"] == "video/mp4":
                    full = (mid, data)
                    break
        except urllib.error.HTTPError:
            continue
    assert full is not None
    mid, data = full
    req = urllib.request.Request(
        f"{base}/media/{mid}", headers={"Range": "bytes=0-99"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 206
        part = r.read()
        assert r.headers["Content-Range"] == f"bytes 0-99/{len(data)}"
    assert part == data[:100]
    # suffix range
    req = urllib.request.Request(
        f"{base}/media/{mid}", headers={"Range": "bytes=-50"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 206
        assert r.read() == data[-50:]


def test_featured_and_storyboard(served_project):
    base, _ = served_project
    status, body = _get(f"{base}/featured?start=0&end=10")
    assert status == 200
    status2, body2 = _get(f"{base}/featured?start=0&end=10")
    assert body == body2  # seeded: deterministic
    # storyboard of a video
    vr_status, search = _get(f"{base}/search?q=x&end=3")
    vid = search["video_results"]["unmerged_windows"][0]["media_id"]
    status, sb = _get(f"{base}/storyboard/{vid}")
    assert status == 200
    assert "tiles" in sb and len(sb["tiles"]) >= 1
    tile = sb["tiles"][0]
    assert {"startTime", "x", "y", "width", "height"} <= set(tile)
    assert sb["url"].endswith(f"storyboard/{vid}/sprite.jpg")
    # sprite image is a decodable JPEG
    with urllib.request.urlopen(
        f"{base}/storyboard/{vid}/sprite.jpg", timeout=30
    ) as r:
        data = r.read()
    assert data[:3] == b"\xff\xd8\xff"


def test_metadata_endpoint(served_project):
    base, _ = served_project
    status, body = _get(f"{base}/metadata/1")
    assert status == 200
    assert {"id", "filename", "width", "height", "media_type"} <= set(body)


def test_report_endpoint(served_project):
    base, _ = served_project
    req = urllib.request.Request(
        f"{base}/report",
        data=json.dumps(
            {"sourceURI": "media/1", "reasons": ["inappropriate"]}
        ).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200


def test_parse_range_unit():
    assert parse_range("bytes=0-99", 1000) == (0, 99)
    assert parse_range("bytes=500-", 1000)[0] == 500
    assert parse_range("bytes=-100", 1000) == (900, 999)
    assert parse_range("bytes=2000-", 1000) is None
    assert parse_range("garbage", 1000) is None
    assert parse_range(None, 1000) is None


def test_parse_multipart_unit():
    boundary = "XX123"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="text_queries"\r\n\r\n'
        "hello\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="image_file_queries"; '
        'filename="a.jpg"\r\nContent-Type: image/jpeg\r\n\r\n'
        "BYTES\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    fields = parse_multipart(body, f'multipart/form-data; boundary="{boundary}"')
    assert fields["text_queries"] == [b"hello"]
    assert fields["image_file_queries"] == [b"BYTES"]


def test_get_search_multi_query_fusion(served_project):
    """Two q values fuse (weighted average) — result differs from either
    single query."""
    base, _ = served_project
    _, single = _get(f"{base}/search?q=alpha&end=5")
    _, fused = _get(f"{base}/search?q=alpha&q=beta&end=5")
    d1 = [s["distance"] for s in single["video_results"]["unmerged_windows"]]
    d2 = [s["distance"] for s in fused["video_results"]["unmerged_windows"]]
    assert d1 != d2
