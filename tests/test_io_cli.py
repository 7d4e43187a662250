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


def test_doctor_cli(tmp_path, capsys):
    from tests.media_fixtures import make_video
    from wise_tpu.cli.doctor import main as doctor_main
    from wise_tpu.pipeline import extract_features

    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "v.mp4", seconds=2, fps=10)
    pdir = tmp_path / "p"
    fid = "wise/random_features/16/doc"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    rc = doctor_main(["--project-dir", str(pdir)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "FAIL" not in out
    assert "project assets" in out and "project db" in out
