"""bf16 activation path: runs, and stays close to the f32 forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wise_tpu.models.clip.model import CLIP, CLIPConfig


def test_bf16_tower_close_to_f32():
    cfg32 = CLIPConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=48,
        vision_layers=2, vision_heads=4, context_length=16, vocab_size=128,
        text_width=32, text_heads=4, text_layers=2, dtype=jnp.float32,
    )
    cfg16 = dataclasses.replace(cfg32, dtype=jnp.bfloat16)
    m32, m16 = CLIP(cfg32), CLIP(cfg16)
    params = m32.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
    )
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    f32 = np.asarray(m32.apply(params, imgs, method=CLIP.encode_image))
    f16 = np.asarray(m16.apply(params, imgs, method=CLIP.encode_image))
    assert f16.dtype == np.float32  # outputs normalised in f32
    cos = np.sum(f32 * f16, axis=1)
    assert (cos > 0.98).all(), f"bf16 drifted: cos={cos}"


def test_extractor_dtype_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("WISE_CHECKPOINT_DIR", str(tmp_path))
    monkeypatch.setenv("WISE_CLIP_DTYPE", "float32")
    from wise_tpu.models.clip import model as clip_model

    tiny = clip_model.CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=8, vocab_size=64,
        text_width=16, text_heads=2, text_layers=1,
    )
    monkeypatch.setitem(clip_model.CLIP_CONFIGS, "ViT-TINY-DT", tiny)
    from wise_tpu.models.clip.extractor import OpenClipExtractor

    fe = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY-DT/x")
    assert fe.config.dtype == jnp.float32
    monkeypatch.setenv("WISE_CLIP_DTYPE", "bfloat16")
    fe2 = OpenClipExtractor("mlfoundations/open_clip/ViT-TINY-DT/x")
    assert fe2.config.dtype == jnp.bfloat16
