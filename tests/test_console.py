"""Interactive console: grammar execution incl. compound @file queries."""

import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.cli.search import main as search_main
from wise_tpu.pipeline import extract_features

FEATURE_ID = "wise/random_features/32/console"


@pytest.fixture(scope="module")
def console_project(tmp_path_factory):
    media = tmp_path_factory.mktemp("cmedia")
    make_video(media / "v1.mp4", seconds=4, fps=10)
    make_image(media / "i1.png", value=90)
    make_image(media / "i2.png", value=180)
    pdir = tmp_path_factory.mktemp("cproj") / "proj"
    extract_features([media], pdir, image_feature_id=FEATURE_ID,
                     video_feature_id=FEATURE_ID, audio_feature_id=FEATURE_ID)
    create_index_main(["--project-dir", str(pdir)])
    return pdir, media


def run_console(pdir, inputs, monkeypatch, capsys):
    it = iter(inputs + ["q"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(it))
    rc = search_main(["--project-dir", str(pdir)])
    assert rc == 0
    return capsys.readouterr().out


def test_text_query(console_project, monkeypatch, capsys):
    pdir, _ = console_project
    out = run_console(pdir, ["cooking in video"], monkeypatch, capsys)
    assert 'Search results for "cooking" in video' in out
    assert "v1.mp4" in out


def test_file_query(console_project, monkeypatch, capsys):
    pdir, media = console_project
    out = run_console(
        pdir, [f"@{media/'i1.png'} in image"], monkeypatch, capsys
    )
    # the exact image embedding retrieves itself at rank 0 with score ~1
    first = [l for l in out.splitlines() if l.strip().startswith("0")]
    assert first and "i1.png" in first[0]
    assert "1.000" in first[0]


def test_compound_file_plus_text(console_project, monkeypatch, capsys):
    pdir, media = console_project
    out = run_console(
        pdir, [f'@{media/"i1.png"} + "bright colors" in image'],
        monkeypatch, capsys,
    )
    assert "Search results for" in out
    assert ".png" in out


def test_not_in_subtraction(console_project, monkeypatch, capsys):
    pdir, _ = console_project
    out = run_console(
        pdir, ["cooking in video AND cooking not in video"], monkeypatch,
        capsys,
    )
    assert "No results found" in out


def test_parse_error_keeps_console_alive(console_project, monkeypatch, capsys):
    pdir, _ = console_project
    out = run_console(
        pdir, ["in video", "cooking in video"], monkeypatch, capsys
    )
    assert "parse error" in out
    assert 'Search results for "cooking" in video' in out
