"""IVF/PQ index types through the full CLI path (build + search + serve)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.media_fixtures import make_video
from wise_tpu.api.server import create_server
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.cli.search import main as search_main
from wise_tpu.pipeline import extract_features

FEATURE_ID = "wise/random_features/32/ivfe2e"


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    media = tmp_path_factory.mktemp("ivfmedia")
    for i in range(4):
        make_video(media / f"v{i}.mp4", seconds=8, fps=10)
    pdir = tmp_path_factory.mktemp("ivfproj") / "proj"
    extract_features([media], pdir, image_feature_id=FEATURE_ID,
                     video_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID)
    for t in ("IndexFlatIP", "IndexIVFFlat", "IndexIVFPQ"):
        assert create_index_main(
            ["--project-dir", str(pdir), "--index-type", t]
        ) == 0
    return pdir


def _search_csv(pdir, index_type, capsys):
    rc = search_main([
        "--project-dir", str(pdir),
        "--query", "skiing", "--in", "video",
        "--index-type", index_type,
        "--topk", "10", "--no-merge",
        "--result-format", "csv",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return out[1:]


def test_ivf_agrees_with_flat_at_full_probe(project, capsys, monkeypatch):
    flat = _search_csv(project, "IndexFlatIP", capsys)
    # nprobe default (1024) >> nlist here, so IVF is exact: same result SET
    ivf = _search_csv(project, "IndexIVFFlat", capsys)
    assert sorted(flat) == sorted(ivf)


def test_ivfpq_returns_plausible_results(project, capsys):
    rows = _search_csv(project, "IndexIVFPQ", capsys)
    assert len(rows) == 10
    # PQ scores are approximate; rows must still parse and reference real files
    for row in rows:
        assert ".mp4" in row


def test_serve_with_ivf_index(project):
    server = create_server(
        project, hostname="127.0.0.1", port=0, index_type="IndexIVFFlat"
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/proj/search?q=skiing&end=5", timeout=30
        ) as r:
            body = json.loads(r.read())
        assert body["video_results"] is not None
        assert len(body["video_results"]["unmerged_windows"]) == 5
    finally:
        server.shutdown()
