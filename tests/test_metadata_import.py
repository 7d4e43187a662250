"""Metadata import + FTS search end-to-end (reference: metadata.py +
sqlite_search_index.py)."""

import sqlite3

import pytest

from tests.media_fixtures import make_video
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.cli.metadata import hhmmss_to_sec, main as metadata_main, time2sec
from wise_tpu.cli.search import main as search_main
from wise_tpu.pipeline import extract_features
from wise_tpu.project import WiseProject

FEATURE_ID = "wise/random_features/32/meta"


def test_time_parsing():
    assert time2sec("12.5") == 12.5
    assert time2sec(3) == 3.0
    assert hhmmss_to_sec("00:01:36.50") == 96.5
    assert time2sec("01:00:00.00") == 3600.0


@pytest.fixture(scope="module")
def project_with_metadata(tmp_path_factory):
    media = tmp_path_factory.mktemp("metamedia")
    make_video(media / "cooking.mp4", seconds=8, fps=10)
    make_video(media / "driving.mp4", seconds=8, fps=10)
    pdir = tmp_path_factory.mktemp("metaproj") / "proj"
    extract_features(
        [media], pdir,
        image_feature_id=FEATURE_ID, video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID, batch_size=16,
    )
    csv_file = tmp_path_factory.mktemp("csv") / "ann.csv"
    csv_file.write_text(
        "uid,vid,start,stop,narration\n"
        "u1,cooking,0.5,3.5,frying vegetables in a pan\n"
        "u2,driving,1.0,4.0,driving a car on the highway\n"
        "u3,cooking,4.0,7.0,chopping onions\n"
        "u4,missing,0.0,2.0,should be dropped\n"
        "u5,cooking,100.0,200.0,out of range dropped\n"
    )
    rc = metadata_main([
        "import",
        "--from-csv", str(csv_file),
        "--metadata-id", "EK/ann/test",
        "--col-metadata-id", "uid",
        "--col-filename", "{vid}.mp4",
        "--col-starttime", "start",
        "--col-stoptime", "stop",
        "--col-metadata", "narration",
        "--project-dir", str(pdir),
    ])
    assert rc == 0
    return pdir


def test_import_validation(project_with_metadata):
    proj = WiseProject(project_with_metadata)
    db_path, table = proj.metadata_db_table("EK/ann/test")
    with sqlite3.connect(str(db_path)) as conn:
        rows = conn.execute(f"SELECT __filename, narration FROM {table}").fetchall()
    assert len(rows) == 3  # u4 missing file, u5 out of range dropped
    assert ("cooking.mp4", "frying vegetables in a pan") in rows


def test_discover_and_fts_search(project_with_metadata, capsys):
    proj = WiseProject(project_with_metadata)
    assets = proj.discover_assets()
    assert "EK/ann/test" in assets["metadata"]

    rc = create_index_main(
        ["--project-dir", str(project_with_metadata), "--media-type", "metadata"]
    )
    assert rc == 0

    rc = search_main([
        "--project-dir", str(project_with_metadata),
        "--query", "vegetables",
        "--in", "metadata",
        "--result-format", "csv",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert '"cooking.mp4"' in out[1]
    assert "0.5,3.5" in out[1]
