"""End-to-end pipeline conformance: extract -> index -> search on synthetic
media with the deterministic RandomFeatures extractor (the hermetic
equivalent of the reference's tests/test-kinetics-6.sh golden run)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video, make_wav
from wise_tpu import db as wdb
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.cli.search import main as search_main
from wise_tpu.pipeline import extract_features
from wise_tpu.project import WiseProject

FEATURE_ID = "wise/random_features/64/e2e"


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    make_video(d / "v1.mp4", seconds=8, fps=10)
    make_video(d / "v2.mp4", seconds=4, fps=10)
    make_wav(d / "a1.wav", seconds=8.0, rate=48000, freq=440.0)
    make_image(d / "i1.png", value=50)
    make_image(d / "i2.png", value=200)
    (d / "junk.mp4").write_bytes(b"garbage")
    return d


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory, media_dir):
    pdir = tmp_path_factory.mktemp("proj") / "p"
    stats = extract_features(
        [media_dir],
        pdir,
        image_feature_id=FEATURE_ID,
        video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID,
        batch_size=16,
        num_workers=2,
    )
    assert stats.num_files == 5
    assert stats.num_unknown_files == 1
    # v1: 8s -> 16 frames, v2: 4s -> 8 frames
    assert stats.num_video_vectors == 24
    # a1.wav: 8s -> 2 full segments
    assert stats.num_audio_vectors == 2
    assert stats.num_image_vectors == 2
    assert stats.num_thumbnails > 0
    return pdir


def test_db_contents(project_dir):
    proj = WiseProject(project_dir)
    conn = wdb.connect(proj.db_path, readonly=True)
    rows = conn.execute(
        "SELECT path, media_type FROM media ORDER BY path"
    ).fetchall()
    assert [tuple(r) for r in rows] == [
        ("a1.wav", "AUDIO"),
        ("i1.png", "IMAGE"),
        ("i2.png", "IMAGE"),
        ("v1.mp4", "VIDEO"),
        ("v2.mp4", "VIDEO"),
    ]
    # video vector timestamps on the 0.5 s grid
    ts = [
        r[0]
        for r in conn.execute(
            "SELECT timestamp FROM vectors WHERE modality='VIDEO' ORDER BY id"
        )
    ]
    assert ts[:4] == [0.0, 0.5, 1.0, 1.5]
    # audio segments have [t, t+4] ranges
    seg = conn.execute(
        "SELECT timestamp, end_timestamp FROM vectors WHERE modality='AUDIO' ORDER BY id"
    ).fetchall()
    assert [tuple(r) for r in seg] == [(0.0, 4.0), (4.0, 8.0)]


def test_discover_and_index(project_dir):
    proj = WiseProject(project_dir)
    assets = proj.discover_assets()
    assert FEATURE_ID in assets["video"]
    assert FEATURE_ID in assets["audio"]
    assert FEATURE_ID in assets["image"]
    rc = create_index_main(["--project-dir", str(project_dir)])
    assert rc == 0
    assets = proj.discover_assets()
    assert "video-IndexFlatIP.widx" in assets["video"][FEATURE_ID]["index_files"]


def test_search_cli_csv(project_dir, capsys):
    rc = search_main(
        [
            "--project-dir", str(project_dir),
            "--query", "frying vegetables",
            "--in", "video",
            "--topk", "5",
            "--result-format", "csv",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "query,rank,filename,start_time,end_time,score"
    assert len(out) > 1
    first = out[1]
    assert first.startswith('"""frying vegetables"" in video",0,')
    # deterministic: second run produces identical output
    search_main(
        [
            "--project-dir", str(project_dir),
            "--query", "frying vegetables",
            "--in", "video",
            "--topk", "5",
            "--result-format", "csv",
        ]
    )
    out2 = capsys.readouterr().out.strip().splitlines()
    assert out == out2


def test_search_cli_multimodal_and_merge1(project_dir, capsys):
    rc = search_main(
        [
            "--project-dir", str(project_dir),
            "--query", "cooking", "--in", "video",
            "--query", "music", "--in", "audio",
            "--topk", "5",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert 'Search results for "cooking" in video' in out
    assert 'Search results for "music" in audio' in out
    # merge1 section present iff some file matched in both; synthetic media
    # has no AV file so no AND hits are required, but headers must render
    assert "Rank" in out


def test_search_queries_from_csv(project_dir, tmp_path, capsys):
    qfile = tmp_path / "queries.csv"
    qfile.write_text("query_id,query_text\nQ1,frying\nQ2,singing\n")
    rc = search_main(
        [
            "--project-dir", str(project_dir),
            "--queries-from", str(qfile),
            "--in", "video",
            "--result-format", "csv",
            "--topk", "3",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    ids = {line.split(",")[0] for line in out[1:]}
    assert ids == {'"Q1"', '"Q2"'}


def test_search_not_in(project_dir, capsys):
    rc = search_main(
        [
            "--project-dir", str(project_dir),
            "--query", "cooking", "--in", "video",
            "--query", "cooking", "--not-in", "video",
            "--topk", "5",
            "--result-format", "csv",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # subtracting the identical query must remove every result
    assert len(out) == 1
