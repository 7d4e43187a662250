import datetime

from wise_tpu import db
from wise_tpu.data_models import (
    MediaMetadata,
    MediaType,
    ModalityType,
    SourceCollection,
    SourceCollectionType,
    ThumbnailMetadata,
    VectorMetadata,
)
from wise_tpu.db.repository import (
    MediaRepo,
    SourceCollectionRepo,
    ThumbnailRepo,
    VectorRepo,
    get_counts,
    get_full_metadata_batch,
    get_project_total_duration,
    get_thumbnail_by_timestamp,
)


def _setup(tmp_path):
    conn = db.init_project(tmp_path / "internal.db")
    sc = SourceCollectionRepo().create(
        conn, SourceCollection(location="/data", type=SourceCollectionType.DIR)
    )
    media = MediaRepo().create(
        conn,
        MediaMetadata(
            source_collection_id=sc.id,
            path="a/b.mp4",
            checksum=b"\x01\x02",
            size_in_bytes=123,
            date_modified=datetime.datetime(2024, 1, 1),
            media_type=MediaType.AV,
            format="mp4",
            width=640,
            height=480,
            num_frames=100,
            duration=12.5,
        ),
    )
    return conn, sc, media


def test_media_round_trip(tmp_path):
    conn, sc, media = _setup(tmp_path)
    got = MediaRepo().get(conn, media.id)
    assert got.path == "a/b.mp4"
    assert got.media_type == MediaType.AV
    assert got.checksum == b"\x01\x02"
    assert got.duration == 12.5
    # enum stored as NAME for sqlalchemy-file compatibility
    raw = conn.execute("SELECT media_type FROM media").fetchone()[0]
    assert raw == "AV"


def test_vector_batch_and_join(tmp_path):
    conn, sc, media = _setup(tmp_path)
    vecs = VectorRepo().create_batch(
        conn,
        [
            VectorMetadata(
                modality=ModalityType.VIDEO,
                media_id=media.id,
                timestamp=float(i) * 0.5,
                end_timestamp=float(i) * 0.5 + 4.0,
            )
            for i in range(5)
        ],
    )
    ids = [v.id for v in vecs]
    assert ids == list(range(1, 6))
    # order-preserving hydrate, reversed request order
    out = get_full_metadata_batch(conn, list(reversed(ids)))
    assert [o.id for o in out] == list(reversed(ids))
    assert out[0].path == "a/b.mp4"
    assert out[0].media_type == MediaType.AV
    assert out[0].modality == ModalityType.VIDEO

    counts = get_counts(conn)
    assert counts == {"num_vectors": 5, "num_media_files": 1}
    assert get_project_total_duration(conn) == 12.5


def test_thumbnail_window(tmp_path):
    conn = db.init_thumbs(tmp_path / "thumbs.db")
    repo = ThumbnailRepo()
    for t in [0.0, 0.5, 1.0, 5.0]:
        repo.create(
            conn,
            ThumbnailMetadata(media_id=1, timestamp=t, content=f"jpg{t}".encode()),
        )
    # window [t-0.25, t+2] -> earliest in-window
    assert get_thumbnail_by_timestamp(conn, 1, 0.6) == b"jpg0.5"
    assert get_thumbnail_by_timestamp(conn, 1, 4.0) == b"jpg5.0"
    assert get_thumbnail_by_timestamp(conn, 1, 10.0) is None
