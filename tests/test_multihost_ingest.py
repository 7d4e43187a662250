"""Multi-host ingest: N workers ingest disjoint file strides with disjoint
id ranges; merge-projects concatenates them into a project equivalent to a
single-process ingest (same vectors, searchable, indexable)."""

import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video, make_wav
from wise_tpu import db as wdb
from wise_tpu.cli.create_index import main as create_index_main
from wise_tpu.cli.merge_projects import main as merge_main
from wise_tpu.cli.search import main as search_main
from wise_tpu.pipeline import extract_features
from wise_tpu.pipeline.extract import INGEST_ID_STRIDE
from wise_tpu.project import WiseProject

FEATURE_ID = "wise/random_features/32/mh"


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh_media")
    make_video(d / "v1.mp4", seconds=4, fps=10)
    make_video(d / "v2.mp4", seconds=4, fps=10)
    make_video(d / "v3.mp4", seconds=2, fps=10)
    make_wav(d / "a1.wav", seconds=8.0, rate=48000, freq=330.0)
    make_image(d / "i1.png", value=60)
    return d


def _ingest(pdir, media_dir, **kw):
    return extract_features(
        [media_dir], pdir,
        image_feature_id=FEATURE_ID, video_feature_id=FEATURE_ID,
        audio_feature_id=FEATURE_ID, batch_size=8, **kw,
    )


@pytest.fixture(scope="module")
def merged(tmp_path_factory, media_dir):
    root = tmp_path_factory.mktemp("mh_proj")
    stats = []
    for w in range(2):
        stats.append(
            _ingest(root / f"w{w}", media_dir, ingest_worker=w,
                    ingest_workers=2)
        )
    assert merge_main([
        "--target-dir", str(root / "merged"),
        "--source-dir", str(root / "w0"),
        "--source-dir", str(root / "w1"),
    ]) == 0
    single = _ingest(root / "single", media_dir)
    return root, stats, single


def test_workers_partition_files(merged):
    root, stats, single = merged
    assert stats[0].num_files + stats[1].num_files == single.num_files
    assert all(s.num_files > 0 for s in stats)


def test_id_ranges_disjoint(merged):
    root, stats, single = merged
    w1 = WiseProject(root / "w1")
    conn = wdb.connect(w1.db_path, readonly=True)
    lo_m = conn.execute("SELECT MIN(id) FROM media").fetchone()[0]
    lo_v = conn.execute("SELECT MIN(id) FROM vectors").fetchone()[0]
    assert lo_m > INGEST_ID_STRIDE and lo_v > INGEST_ID_STRIDE


def test_merged_equals_single_ingest(merged):
    """Same vector multiset: every (filename, timestamp) row of the single
    ingest appears in the merge, and counts match exactly."""
    root, stats, single = merged

    def rows(pdir):
        conn = wdb.connect(WiseProject(pdir).db_path, readonly=True)
        return sorted(
            (r["path"], r["modality"], round(r["timestamp"] or 0, 4))
            for r in conn.execute(
                "SELECT m.path, v.modality, v.timestamp FROM vectors v "
                "JOIN media m ON v.media_id = m.id"
            )
        )

    assert rows(root / "merged") == rows(root / "single")


def test_merged_project_is_searchable(merged):
    root, _, _ = merged
    proj = str(root / "merged")
    assert create_index_main(["--project-dir", proj]) == 0
    assert search_main([
        "--project-dir", proj, "--query", "anything", "--in", "video",
        "--topk", "3", "--result-format", "csv",
        "--save-to-file", str(root / "out.csv"),
    ]) == 0
    text = (root / "out.csv").read_text()
    assert "v1.mp4" in text or "v2.mp4" in text or "v3.mp4" in text


def test_merge_rejects_colliding_ids(tmp_path, media_dir):
    """Two projects ingested WITHOUT worker ranks collide on media ids."""
    for name in ("a", "b"):
        _ingest(tmp_path / name, media_dir)
    with pytest.raises(SystemExit, match="disjoint"):
        merge_main([
            "--target-dir", str(tmp_path / "m"),
            "--source-dir", str(tmp_path / "a"),
            "--source-dir", str(tmp_path / "b"),
        ])


def test_incremental_merge_into_existing_target(tmp_path, media_dir):
    """A later worker's project merges into an already-merged target (grow
    the corpus without rebuilding): counts add up and ids stay disjoint."""
    for w in range(3):
        _ingest(tmp_path / f"w{w}", media_dir, ingest_worker=w,
                ingest_workers=3)
    assert merge_main([
        "--target-dir", str(tmp_path / "m"),
        "--source-dir", str(tmp_path / "w0"),
        "--source-dir", str(tmp_path / "w1"),
    ]) == 0
    assert merge_main([
        "--target-dir", str(tmp_path / "m"),
        "--source-dir", str(tmp_path / "w2"),
    ]) == 0
    conn = wdb.connect(WiseProject(tmp_path / "m").db_path, readonly=True)
    n_media = conn.execute("SELECT COUNT(*) FROM media").fetchone()[0]
    n_sc = conn.execute(
        "SELECT COUNT(*) FROM source_collections").fetchone()[0]
    assert n_media == 5 and n_sc == 1  # same media dir deduped
    ids = [r[0] for r in conn.execute("SELECT id FROM media")]
    assert len(set(ids)) == 5
    # re-merging the same worker collides and aborts
    with pytest.raises(SystemExit, match="disjoint"):
        merge_main([
            "--target-dir", str(tmp_path / "m"),
            "--source-dir", str(tmp_path / "w2"),
        ])
