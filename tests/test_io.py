import numpy as np
import pytest

from tests.media_fixtures import make_image, make_video, make_wav
from wise_tpu.config import AudioIngestConfig, ThumbnailConfig, VideoIngestConfig
from wise_tpu.data_models import MediaType
from wise_tpu.io import (
    get_dataset,
    get_media_metadata,
    get_media_type,
    get_metadata_for_valid_files,
    probe_media,
)
from wise_tpu.io import native_decoder
from wise_tpu.io.decode import iter_audio_segments, iter_video_frames


def test_native_decoder_builds():
    assert native_decoder.available(), "native FFmpeg decoder must build/load"


def test_probe_video(tmp_path):
    f = tmp_path / "v.mp4"
    make_video(f, seconds=4, fps=10)
    info = probe_media(f)
    assert info is not None and info.has_video
    assert info.width == 64 and info.height == 48
    assert abs(info.duration - 4.0) < 0.5
    assert abs(info.fps - 10.0) < 0.5
    assert get_media_type(f) == MediaType.VIDEO


def test_probe_wav(tmp_path):
    f = tmp_path / "a.wav"
    make_wav(f, seconds=2.0, rate=16000)
    info = probe_media(f)
    assert info is not None and info.has_audio and not info.has_video
    assert info.sample_rate == 16000
    assert abs(info.duration - 2.0) < 0.1
    assert get_media_type(f) == MediaType.AUDIO


def test_video_fps_sampling(tmp_path):
    f = tmp_path / "v.mp4"
    make_video(f, seconds=4, fps=10)  # red channel = 10+20*sec
    chunks = list(iter_video_frames(f, fps=2.0, frames_per_chunk=8))
    frames = np.concatenate([c[0] for c in chunks])
    pts = np.concatenate([c[1] for c in chunks])
    # 4 s at 2 fps -> ticks 0.0 .. 3.5 (8 frames)
    assert len(frames) == 8
    np.testing.assert_allclose(pts, np.arange(8) * 0.5, atol=1e-6)
    # each sampled frame must carry its second's red value
    red = frames[:, 0, 0, 0].astype(int)
    expect = 10 + 20 * (pts.astype(int))
    # codecs shift values slightly; allow small tolerance
    np.testing.assert_allclose(red, expect, atol=12)


def test_audio_segments_and_resample(tmp_path):
    f = tmp_path / "a.wav"
    make_wav(f, seconds=4.0, rate=16000, freq=440.0)
    segs = list(iter_audio_segments(f, sample_rate=48000, segment_samples=48000))
    assert len(segs) == 4
    wav, pts0 = segs[0]
    assert wav.shape == (48000,)
    assert pts0 == pytest.approx(0.0, abs=0.01)
    assert segs[2][1] == pytest.approx(2.0, abs=0.01)
    # dominant frequency preserved through resampling
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    peak_hz = np.argmax(spec) * 48000 / len(wav)
    assert abs(peak_hz - 440.0) < 5.0
    # amplitude preserved
    assert 0.3 < np.abs(wav).max() < 0.7


def test_av_dataset_alignment_and_thumbs(tmp_path):
    vf = tmp_path / "v.mp4"
    make_video(vf, seconds=8, fps=10)
    ds = get_dataset(
        MediaType.VIDEO,
        [vf],
        video=VideoIngestConfig(),
        thumbnails=ThumbnailConfig(),
    )
    chunks = list(ds)
    assert len(chunks) == 2  # 8 s -> two 4 s chunks of 8 frames @2fps
    path, first = chunks[0]
    assert first["video"].tensor.shape == (8, 48, 64, 3)
    assert len(first["thumbnails"]) == 8
    pts, jpeg = first["thumbnails"][0]
    assert jpeg[:3] == b"\xff\xd8\xff"  # JPEG magic


def test_audio_dataset_short_tail(tmp_path):
    af = tmp_path / "a.wav"
    make_wav(af, seconds=5.0, rate=48000)
    ds = get_dataset(MediaType.AUDIO, [af], audio=AudioIngestConfig())
    segs = [c for _, c in ds]
    assert len(segs) == 2
    assert segs[0]["audio"].tensor.shape == (192000,)
    assert segs[1]["audio"].tensor.shape[0] < 192000  # ragged tail yielded


def test_segment_alignment_validation():
    from wise_tpu.io.dataset import AVDataset

    with pytest.raises(ValueError):
        AVDataset(
            [],
            video=VideoIngestConfig(frame_rate=2.0, frames_per_chunk=8),
            audio=AudioIngestConfig(segment_length=3.0),
        )


def test_metadata_probe_and_invalid(tmp_path):
    vf = tmp_path / "v.mp4"
    make_video(vf)
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video at all")
    img = tmp_path / "i.png"
    make_image(img)

    valid, unknown = get_metadata_for_valid_files([vf, bad, img])
    assert [p.name for p, _ in valid] == ["v.mp4", "i.png"]
    assert [p.name for p in unknown] == ["bad.mp4"]
    meta = dict((p.name, m) for p, m in valid)
    assert meta["v.mp4"].media_type == MediaType.VIDEO
    assert meta["v.mp4"].width == 64
    assert len(meta["v.mp4"].checksum) == 16
    assert meta["i.png"].media_type == MediaType.IMAGE


def test_worker_sharding(tmp_path):
    files = []
    for i in range(4):
        f = tmp_path / f"v{i}.mp4"
        make_video(f, seconds=1, fps=4)
        files.append(f)
    seen = set()
    for wid in range(2):
        ds = get_dataset(
            MediaType.VIDEO, files, video=VideoIngestConfig(), worker_id=wid,
            num_workers=2,
        )
        seen_w = {p.name for p, _ in ds}
        assert seen_w == {f"v{i}.mp4" for i in range(wid, 4, 2)}
        seen |= seen_w
    assert len(seen) == 4
