"""serve CLI config assembly (blocklist file, env overrides, frontend
default) and the profiling trace hook."""

import os

import pytest


def test_serve_cli_config(tmp_path, monkeypatch):
    from tests.media_fixtures import make_video
    from wise_tpu.pipeline import extract_features

    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "v.mp4", seconds=2, fps=10)
    pdir = tmp_path / "proj"
    fid = "wise/random_features/16/servecli"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)

    blocklist = tmp_path / "blocked.txt"
    blocklist.write_text("verboten\n\nbad term\n")
    monkeypatch.setenv("PORT", "7777")
    monkeypatch.setenv("QUERY_PREFIX", "An image of")

    captured = {}

    def fake_serve(project_dir, hostname, port, config, frontend_dir,
                   index_type):
        captured.update(
            project_dir=project_dir, hostname=hostname, port=port,
            config=config, frontend_dir=frontend_dir, index_type=index_type,
        )

    import wise_tpu.cli.serve as serve_cli

    # serve_cli imports `serve` inside main(); patch the source module
    monkeypatch.setattr(
        "wise_tpu.api.server.serve", fake_serve, raising=True
    )
    rc = serve_cli.main([
        str(pdir), "--query-blocklist", str(blocklist), "--port", "9999",
    ])
    assert rc == 0
    cfg = captured["config"]
    assert cfg.search.query_blocklist == ("verboten", "bad term")
    assert cfg.serve.port == 7777          # env override applied
    assert cfg.search.query_prefix == "An image of"
    assert captured["port"] == 9999        # CLI flag wins for bind port
    assert captured["frontend_dir"] and "frontend" in captured["frontend_dir"]


def test_trace_hook(tmp_path, monkeypatch):
    from wise_tpu.utils.profiling import trace

    # no env -> no-op
    with trace("x"):
        pass
    # with env -> writes a trace directory
    monkeypatch.setenv("WISE_TRACE_DIR", str(tmp_path))
    import jax.numpy as jnp

    with trace("unit"):
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    assert any((tmp_path / "unit").rglob("*")), "no trace files written"
