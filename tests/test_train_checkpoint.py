"""Training checkpoint/resume (orbax) + fine-tune CLI smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clip.model import CLIPConfig
from wise_tpu.parallel.mesh import get_mesh
from wise_tpu.parallel.train import CLIPTrainer

TINY = CLIPConfig(
    embed_dim=16, image_size=32, patch_size=16, vision_width=32,
    vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
    text_width=32, text_heads=2, text_layers=1,
)


def test_checkpoint_round_trip(tmp_path):
    mesh = get_mesh(dp=2, mp=1, devices=jax.devices()[:2])
    trainer = CLIPTrainer(TINY, mesh, learning_rate=1e-2)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    step_fn = trainer.make_train_step()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 63, (4, 8)), jnp.int32)
    params, opt_state, _ = step_fn(params, opt_state, images, tokens)

    trainer.save_checkpoint(tmp_path, 1, params, opt_state)
    # fresh trainer restores
    trainer2 = CLIPTrainer(TINY, mesh, learning_rate=1e-2)
    p2, o2 = trainer2.init(jax.random.PRNGKey(1))  # different init
    step, p2, o2 = trainer2.restore_checkpoint(tmp_path, p2, o2)
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training identically
    n1 = step_fn(params, opt_state, images, tokens)[2]
    n2 = trainer2.make_train_step()(p2, o2, images, tokens)[2]
    assert float(n1) == pytest.approx(float(n2), rel=1e-6)


def test_train_cli_smoke(tmp_path, monkeypatch):
    from tests.media_fixtures import make_video
    from wise_tpu.cli.metadata import main as metadata_main
    from wise_tpu.pipeline import extract_features

    media = tmp_path / "m"
    media.mkdir()
    make_video(media / "cook.mp4", seconds=4, fps=10)
    pdir = tmp_path / "p"
    fid = "wise/random_features/16/train"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    csv_file = tmp_path / "ann.csv"
    csv_file.write_text(
        "uid,vid,start,stop,narration\n"
        "u1,cook,0.0,2.0,frying vegetables\n"
        "u2,cook,2.0,3.9,stirring the pan\n"
    )
    rc = metadata_main([
        "import", "--from-csv", str(csv_file),
        "--metadata-id", "T/ann/train",
        "--col-metadata-id", "uid", "--col-filename", "{vid}.mp4",
        "--col-starttime", "start", "--col-stoptime", "stop",
        "--col-metadata", "narration",
        "--project-dir", str(pdir),
    ])
    assert rc == 0

    from wise_tpu.models.clip import model as clip_model

    monkeypatch.setitem(clip_model.CLIP_CONFIGS, "ViT-TRAINTEST", TINY)
    from wise_tpu.cli.train import main as train_main

    rc = train_main([
        "--project-dir", str(pdir),
        "--metadata-id", "T/ann/train",
        "--caption-column", "narration",
        "--model", "ViT-TRAINTEST",
        "--steps", "3", "--batch-size", "2",
        "--dp", "2", "--dtype", "float32",
        "--checkpoint-every", "0",
    ])
    assert rc == 0
    ckpts = list((pdir / "checkpoints" / "ViT-TRAINTEST").glob("step_*"))
    assert len(ckpts) == 1
