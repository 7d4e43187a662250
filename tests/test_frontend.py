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


def test_page_has_parity_features():
    """Round-2 frontend parity features (reference SearchResults.tsx,
    WiseOverviewCard.tsx, ImageDetailsModal, DataService pagination)."""
    html = (FRONTEND / "index.html").read_text()
    for needle in (
        "IntersectionObserver",        # infinite scroll
        "groupByMedia",                # video-occurrences grouped view
        "renderOverview",              # overview/info card
        "metadata/",                   # image-details modal fetch
        'params.set("start"',          # paginated search requests
        "playerDetails",               # details table in the modal
    ):
        assert needle in html, needle


def _pure_js_block():
    html = (FRONTEND / "index.html").read_text()
    js = html.split("<script>")[1].split("</script>")[0]
    start = js.index("// pure data shaping")
    end = js.index("// query chips")
    return js[start:end]


def test_pure_functions_have_no_dom_access():
    """segments()/groupByMedia() must stay DOM-free — they are the
    contract-tested data layer (no JS engine exists here, so keeping them
    pure is what makes the shape test below meaningful)."""
    block = _pure_js_block()
    for forbidden in ("document.", "$(", "innerHTML", "createElement"):
        assert forbidden not in block, forbidden


def _extract_props(src, var):
    """Property names the JS reads off `var.` (e.g. seg.media_id)."""
    import re

    return set(re.findall(rf"\b{var}\.([A-Za-z_][A-Za-z0-9_]*)", src))


def test_js_api_contract_against_live_response(frontend_server):
    """Every field the page JS reads from a search response must exist in a
    REAL response from the server — catches contract drift on either side
    without a browser. (DOM behaviour itself needs a browser-equipped host;
    see ROADMAP.)"""
    with urllib.request.urlopen(
        urllib.request.Request(
            frontend_server + "/search?text_queries=test&search_in=video"
            "&start=0&end=5&thumbnails_to_send=2",
            method="POST",
        ),
        timeout=60,
    ) as r:
        data = json.loads(r.read())

    html = (FRONTEND / "index.html").read_text()
    js = html.split("<script>")[1].split("</script>")[0]

    # top-level result groups referenced by segments()
    for key in ("video_results", "audio_results", "image_results"):
        assert f'"{key}"' in js or f"data.{key}" in js
        assert key in data, key
    vr = data["video_results"]
    assert vr is not None
    assert "merged_windows" in vr and "videos" in vr

    # fields read off each window object (seg.*) — optional ones may be
    # absent per-item but the names must exist somewhere in the response
    windows = vr["merged_windows"]
    assert windows, "expected at least one merged window"
    present = set().union(*(w.keys() for w in windows))
    read = _extract_props(js, "seg")
    optional = {"thumbnail"}  # inlined for first K only
    missing = read - present - optional
    assert not missing, f"JS reads seg.{missing} but API never sends them"
    for w in windows:
        # media_id is a string id (reference types.ts serialises ids as str);
        # the JS uses it as a map key, so either works — but it must parse
        assert str(w["media_id"]).isdigit()
        assert "distance" in w and "ts" in w and "te" in w

    # fields read off the per-media info objects (info.*)
    infos = vr["videos"]
    assert str(windows[0]["media_id"]) in {str(k) for k in infos}
    # `info` names both per-media objects and the /info payload in the JS;
    # the /info fields are validated against /info below
    info_fields = {"num_media_files", "num_vectors", "total_duration",
                   "media_types", "project_id"}
    info_present = set().union(*(v.keys() for v in infos.values()))
    info_read = _extract_props(js, "info") - info_fields
    missing = info_read - info_present - {"thumbnail"}
    assert not missing, f"JS reads info.{missing} but API never sends them"

    # /info fields the overview card renders
    with urllib.request.urlopen(frontend_server + "/info", timeout=30) as r:
        info = json.loads(r.read())
    for k in _extract_props(js, "info") & {
        "num_media_files", "num_vectors", "total_duration", "media_types",
        "project_id",
    }:
        assert k in info, k

    # /metadata/{id} fields the details modal renders
    with urllib.request.urlopen(
        frontend_server + f"/metadata/{windows[0]['media_id']}", timeout=30
    ) as r:
        md = json.loads(r.read())
    for k in ("media_type", "format", "width", "height", "duration"):
        assert k in md, k


def test_search_pagination_pages_differ(frontend_server):
    """The infinite-scroll contract: successive start/end windows return
    successive rank ranges."""
    def page(start, end):
        with urllib.request.urlopen(
            urllib.request.Request(
                frontend_server
                + f"/search?text_queries=test&search_in=video"
                + f"&start={start}&end={end}",
                method="POST",
            ),
            timeout=60,
        ) as r:
            data = json.loads(r.read())
        return [
            w["vector_id"]
            for w in data["video_results"]["unmerged_windows"]
        ]

    p0, p1 = page(0, 3), page(3, 6)
    assert p0 and p1 and not (set(p0) & set(p1))
