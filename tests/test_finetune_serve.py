"""Fine-tune -> serve loop: orbax checkpoints written by the trainer load
directly into the serving extractor."""

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
    text_width=16, text_heads=2, text_layers=1,
)


def test_orbax_checkpoint_serves(tmp_path, monkeypatch):
    # "fine-tune": one step, save under the extractor's checkpoint layout
    mesh = get_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    trainer = CLIPTrainer(TINY, mesh, learning_rate=1e-3)
    params, opt_state = trainer.init(jax.random.PRNGKey(7))
    step = trainer.make_train_step()
    rng = np.random.default_rng(0)
    params, opt_state, _ = step(
        params, opt_state,
        jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.integers(1, 63, (2, 8)), jnp.int32),
    )
    ckpt_dir = tmp_path / "ViT-TINY-FT" / "tuned"
    trainer.save_checkpoint(ckpt_dir, 1, params, opt_state)

    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    from wise_tpu.models.clip import model as clip_model

    monkeypatch.setitem(clip_model.CLIP_CONFIGS, "ViT-TINY-FT", TINY)
    from wise_tpu.models.clip.extractor import OpenClipExtractor

    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    fe = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY-FT/tuned")
    served = fe.extract_image_features(img)
    # reload -> identical (reads the same checkpoint)
    fe2 = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY-FT/tuned")
    np.testing.assert_allclose(
        served, fe2.extract_image_features(img), atol=1e-6
    )
    # a random-init extractor (no checkpoint for this pretrained tag)
    # produces different embeddings -> the trained weights are really served
    fe_rand = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY-FT/none")
    assert not np.allclose(
        served, fe_rand.extract_image_features(img), atol=1e-3
    )
