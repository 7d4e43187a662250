"""Frontend bundle served by the API server."""

import json
import threading
import urllib.request
from pathlib import Path

import pytest

from tests.media_fixtures import make_video
from wise_tpu.api.server import create_server
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.pipeline import extract_features

FRONTEND = Path(__file__).resolve().parents[1] / "frontend"


@pytest.fixture(scope="module")
def frontend_server(tmp_path_factory):
    media = tmp_path_factory.mktemp("femedia")
    make_video(media / "v.mp4", seconds=4, fps=10)
    pdir = tmp_path_factory.mktemp("feproj") / "proj"
    fid = "wise/random_features/16/fe"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    create_index_main(["--project-dir", str(pdir)])
    server = create_server(
        pdir, hostname="127.0.0.1", port=0, frontend_dir=FRONTEND
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}/proj"
    server.shutdown()


def test_index_html_served(frontend_server):
    with urllib.request.urlopen(frontend_server + "/", timeout=10) as r:
        body = r.read().decode()
    assert r.headers["Content-Type"].startswith("text/html")
    assert "WISE" in body
    # the page drives the same endpoints the API exposes
    for endpoint in ("search?", "featured?", "media/", "report", "info"):
        assert endpoint in body


def test_spa_fallback(frontend_server):
    with urllib.request.urlopen(frontend_server + "/some/route", timeout=10) as r:
        assert "WISE" in r.read().decode()


def test_page_js_delimiters_balanced():
    """No browser/JS engine exists in CI: catch the gross syntax-error class
    (unbalanced delimiters kill ALL page script) with a string-stripped
    balance check."""
    import re

    html = (FRONTEND / "index.html").read_text()
    js = html.split("<script>")[1].split("</script>")[0]
    clean = re.sub(
        r"`[^`]*`|\"(?:[^\"\\\\]|\\\\.)*\"|'(?:[^'\\\\]|\\\\.)*'|//[^\n]*",
        "", js,
    )
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    for ch in clean:
        if ch in "([{":
            stack.append(ch)
        elif ch in ")]}":
            assert stack and stack.pop() == pairs[ch], "unbalanced " + ch
    assert not stack


def test_page_wires_new_endpoints():
    """Hover preview + upload chips reference the API they depend on."""
    html = (FRONTEND / "index.html").read_text()
    for needle in ("storyboard/", "_file_queries", "FormData", "mouseenter"):
        assert needle in html, needle
