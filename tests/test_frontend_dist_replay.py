"""Drop-in REST compatibility with the reference's BUILT frontend.

Replays the exact HTTP call sequence the reference SPA issues
(frontend/src/DataService.ts:126-240 + dist/config.js): featured with
thumbs/random_seed, POST search with text_queries in the URL and file
queries as multipart FormData (the precise field names the browser
sends), internal-image queries, then every URL the RESPONSE hands back
(thumbnail, timeline_hover_thumbnails storyboard, media link with Range)
— all against a live server, no browser needed. Also serves the actual
/root/reference/frontend/dist bundle unchanged when present (env-gated on
other machines) and checks the serve-time <base href> patch
(reference api/__init__.py:84-92)."""

import io
import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video, make_wav
from wise_tpu.api.server import create_server
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.pipeline import extract_features

FEATURE_ID = "wise/random_features/32/dist"
REF_DIST = Path("/root/reference/frontend/dist")


@pytest.fixture(scope="module")
def dist_served(tmp_path_factory):
    media = tmp_path_factory.mktemp("distmedia")
    make_video(media / "v1.mp4", seconds=8, fps=10)
    make_video(media / "v2.mp4", seconds=4, fps=10)
    make_wav(media / "a1.wav", seconds=8.0, rate=48000)
    make_image(media / "i1.png", value=50)
    pdir = tmp_path_factory.mktemp("distproj") / "proj"
    extract_features(
        [media], pdir,
        image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID,
        batch_size=16,
    )
    create_index_main(["--project-dir", str(pdir)])
    server = create_server(
        pdir, hostname="127.0.0.1", port=0,
        frontend_dir=REF_DIST if REF_DIST.exists() else None,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}/proj"
    server.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read(), dict(r.headers)


def _get_json(url):
    status, body, _ = _get(url)
    return status, json.loads(body)


def _post(url, data=None, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _multipart(fields):
    """Encode (name, filename, bytes) tuples exactly as a browser FormData
    POST does."""
    boundary = "----WebKitFormBoundaryDistReplay01"
    out = io.BytesIO()
    for name, filename, payload in fields:
        out.write(f"--{boundary}\r\n".encode())
        if filename is None:
            out.write(
                f'Content-Disposition: form-data; name="{name}"'
                "\r\n\r\n".encode()
            )
            out.write(payload if isinstance(payload, bytes)
                      else payload.encode())
        else:
            out.write(
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{filename}"\r\n'
                "Content-Type: application/octet-stream\r\n\r\n".encode()
            )
            out.write(payload)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def _assert_video_results_shape(vr):
    """frontend/src/misc/types.ts:63-84 — the fields the SPA reads."""
    assert {"total", "unmerged_windows", "merged_windows", "videos"} <= set(vr)
    for seg in vr["unmerged_windows"] + vr["merged_windows"]:
        assert {"vector_id", "media_id", "ts", "te", "link", "distance",
                "thumbnail", "thumbnail_score"} <= set(seg)
    for info in vr["videos"].values():
        assert {"id", "filename", "media_type", "duration", "link",
                "thumbnail", "timeline_hover_thumbnails"} <= set(info)


def test_featured_with_dist_params(dist_served):
    """DataService.fetchFeaturedImages: start/end/thumbs/random_seed."""
    status, body = _get_json(
        f"{dist_served}/featured?start=0&end=10&thumbs=1&random_seed=248"
    )
    assert status == 200 and "time" in body
    assert body.get("video_results") or body.get("image_results")
    if body.get("video_results"):
        _assert_video_results_shape(body["video_results"])
    # distinct seeds give distinct orders on >1 video; same seed is stable
    again = _get_json(
        f"{dist_served}/featured?start=0&end=10&thumbs=1&random_seed=248"
    )[1]
    assert json.dumps(again, sort_keys=True) == json.dumps(
        body, sort_keys=True
    )


def test_post_search_text_query_in_url(dist_served):
    """DataService.fetchSearchResults: POST with empty body, text_queries
    as URL params."""
    qs = urllib.parse.urlencode([
        ("start", "0"), ("end", "10"), ("thumbs", "1"),
        ("search_in", "video"), ("text_queries", "a dog running"),
    ])
    status, body = _post(f"{dist_served}/search?{qs}")
    assert status == 200
    vr = body["video_results"]
    _assert_video_results_shape(vr)
    assert vr["total"] >= len(vr["unmerged_windows"]) > 0


def test_post_search_multipart_file_fields(dist_served):
    """Browser FormData upload: image_file_queries + a negative text in
    the URL — exact wire format."""
    from tests.media_fixtures import make_image

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        img = Path(d) / "q.png"
        make_image(img, value=120)
        payload, ctype = _multipart(
            [("image_file_queries", "q.png", img.read_bytes())]
        )
    qs = urllib.parse.urlencode([
        ("start", "0"), ("end", "5"), ("thumbs", "0"),
        ("search_in", "video"), ("negative_text_queries", "cats"),
    ])
    status, body = _post(
        f"{dist_served}/search?{qs}", data=payload,
        headers={"Content-Type": ctype},
    )
    assert status == 200
    _assert_video_results_shape(body["video_results"])


def test_post_search_internal_image_query(dist_served):
    """Find-similar: internal_image_queries=<vector_id> as URL param."""
    seed = _get_json(f"{dist_served}/search?q=anything&end=3")[1]
    vid = seed["video_results"]["unmerged_windows"][0]["vector_id"]
    qs = urllib.parse.urlencode([
        ("start", "0"), ("end", "5"), ("search_in", "video"),
        ("internal_image_queries", vid),
    ])
    status, body = _post(f"{dist_served}/search?{qs}")
    assert status == 200
    assert body["video_results"]["unmerged_windows"]


def test_response_urls_resolve(dist_served):
    """Every URL the response hands the SPA must fetch under the project
    base: thumbnail, storyboard JSON (+ its sprite), media with Range."""
    _, body = _get_json(f"{dist_served}/search?q=road&end=3&thumbs=0")
    vr = body["video_results"]
    seg = vr["unmerged_windows"][0]
    info = vr["videos"][seg["media_id"]]

    # the SPA accepts either an inline data URI (first num_inline thumbs)
    # or a relative URL it prepends API_BASE_URL to (DataService.ts:48-58)
    if seg["thumbnail"].startswith("data:"):
        assert seg["thumbnail"].startswith("data:image/jpeg")
    else:
        status, raw, _ = _get(f"{dist_served}/{seg['thumbnail']}")
        assert status == 200 and raw[:2] == b"\xff\xd8"
    # the URL form must resolve regardless
    status, raw, _ = _get(f"{dist_served}/thumbs/{seg['vector_id']}")
    assert status == 200 and raw[:2] == b"\xff\xd8"  # JPEG SOI

    status, sb_raw, _ = _get(
        f"{dist_served}/{info['timeline_hover_thumbnails']}"
    )
    sb = json.loads(sb_raw)
    assert status == 200 and sb.get("tiles")

    status, chunk, headers = _get(
        f"{dist_served}/{info['link']}", headers={"Range": "bytes=0-99"}
    )
    assert status == 206 and len(chunk) == 100
    assert headers["Content-Range"].startswith("bytes 0-99/")


def test_reference_thumbnail_route(dist_served):
    """The reference's own /thumbnail?media_id=&timestamp= route
    (routes.py:243-260) is served as an alias."""
    _, body = _get_json(f"{dist_served}/search?q=road&end=3")
    media_id = body["video_results"]["unmerged_windows"][0]["media_id"]
    status, raw, _ = _get(
        f"{dist_served}/thumbnail?media_id={media_id}&timestamp=0.5"
    )
    assert status == 200 and raw[:2] == b"\xff\xd8"
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{dist_served}/thumbnail?media_id=99999&timestamp=0.0")
    assert e.value.code == 404


@pytest.mark.skipif(not REF_DIST.exists(),
                    reason="reference frontend/dist not present")
def test_serves_reference_dist_unchanged(dist_served):
    """The reference's built SPA mounts as-is: index.html with the base
    href patched to /{project}/, config.js and hashed assets served."""
    status, html, _ = _get(f"{dist_served}/")
    assert status == 200
    assert b'<base href="/proj/" />' in html
    status, cfg, _ = _get(f"{dist_served}/config.js")
    assert status == 200 and b"API_BASE_URL" in cfg
    # fetch one hashed asset the way index.html references it
    import re as _re

    m = _re.search(rb'assets/[A-Za-z0-9_.-]+\.js', html)
    assert m, "dist index.html references no assets"
    status, js, _ = _get(f"{dist_served}/{m.group(0).decode()}")
    assert status == 200 and len(js) > 1000
