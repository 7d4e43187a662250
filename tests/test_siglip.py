"""SigLIP-style variants: MAP-pooled vision, non-causal last-pooled text."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clip.model import CLIP, CLIPConfig

TINY_SIGLIP = CLIPConfig(
    embed_dim=32, image_size=32, patch_size=16, vision_width=32,
    vision_layers=2, vision_heads=4, context_length=12, vocab_size=128,
    text_width=32, text_heads=4, text_layers=2,
    vision_pool="map", text_causal=False, text_pool="last",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CLIP(TINY_SIGLIP)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32),
    )
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    img, txt, scale = model.apply(
        params,
        jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
        jnp.array([[5, 9, 3] + [0] * 9] * 3, jnp.int32),
    )
    assert img.shape == (2, 32) and txt.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(img, axis=1), 1.0, rtol=1e-5)


def test_no_class_token_params(model_and_params):
    model, params = model_and_params
    visual = params["params"]["visual"]
    assert "class_embedding" not in visual
    assert "attn_pool" in visual
    # pos embed covers exactly the patch grid (no cls slot)
    assert visual["positional_embedding"].shape[0] == (32 // 16) ** 2


def test_non_causal_text(model_and_params):
    """A change in a late token must affect the representation even when
    pooling reads the (fixed) last position — and with bidirectional
    attention an early-token change reaches the last position too."""
    model, params = model_and_params
    t1 = jnp.array([[5, 9, 3] + [0] * 9], jnp.int32)
    t2 = jnp.array([[6, 9, 3] + [0] * 9], jnp.int32)
    f1 = np.asarray(model.apply(params, t1, method=CLIP.encode_text))
    f2 = np.asarray(model.apply(params, t2, method=CLIP.encode_text))
    assert not np.allclose(f1, f2, atol=1e-5)


def test_registry_configs():
    from wise_tpu.models.clip.model import get_clip_config

    c = get_clip_config("ViT-L-16-SigLIP-384")
    assert c.image_size == 384 and c.vision_pool == "map"
    assert not c.text_causal and c.text_pool == "last"
    c2 = get_clip_config("ViT-B-16-SigLIP-256")
    assert c2.embed_dim == 768
