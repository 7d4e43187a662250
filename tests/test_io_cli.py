"""Standalone dataloader CLI smoke (reference: src/dataloader/__main__.py)."""

from tests.media_fixtures import make_video, make_wav
from wise_tpu.io.__main__ import main as io_main


def test_probe_only(tmp_path, capsys):
    make_video(tmp_path / "v.mp4", seconds=2, fps=10)
    rc = io_main([str(tmp_path), "--media-type", "video", "--probe-only"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 valid files" in out
    assert "video 64x48" in out


def test_decode_run(tmp_path, capsys):
    make_video(tmp_path / "v.mp4", seconds=4, fps=10)
    rc = io_main([str(tmp_path), "--media-type", "video", "--thumbnails"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "8 frames" in out
    assert "frames/s decode" in out


def test_audio_run(tmp_path, capsys):
    make_wav(tmp_path / "a.wav", seconds=4.0, rate=48000)
    rc = io_main([str(tmp_path), "--media-type", "audio"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "audio samples" in out
