"""SigLIP (open_clip/timm naming) checkpoint conversion: tree/shape
compatibility with the MAP-pooled CLIP model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clip.convert import convert_openclip_state_dict
from wise_tpu.models.clip.model import CLIP, CLIPConfig

TINY = CLIPConfig(
    embed_dim=32, image_size=32, patch_size=16, vision_width=32,
    vision_layers=2, vision_heads=4, context_length=12, vocab_size=96,
    text_width=32, text_heads=4, text_layers=2,
    vision_pool="map", text_causal=False, text_pool="last",
    act="gelu_tanh", text_proj_bias=True,
)


def _fake_siglip_sd(c):
    rng = np.random.default_rng(0)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    grid = c.image_size // c.patch_size
    vt = "visual.trunk"
    w(f"{vt}.patch_embed.proj.weight", c.vision_width, 3, c.patch_size, c.patch_size)
    w(f"{vt}.patch_embed.proj.bias", c.vision_width)
    w(f"{vt}.pos_embed", 1, grid * grid, c.vision_width)
    w(f"{vt}.norm.weight", c.vision_width)
    w(f"{vt}.norm.bias", c.vision_width)
    for i in range(c.vision_layers):
        b = f"{vt}.blocks.{i}"
        for ln in (".norm1", ".norm2"):
            w(b + ln + ".weight", c.vision_width)
            w(b + ln + ".bias", c.vision_width)
        w(b + ".attn.qkv.weight", 3 * c.vision_width, c.vision_width)
        w(b + ".attn.qkv.bias", 3 * c.vision_width)
        w(b + ".attn.proj.weight", c.vision_width, c.vision_width)
        w(b + ".attn.proj.bias", c.vision_width)
        w(b + ".mlp.fc1.weight", 4 * c.vision_width, c.vision_width)
        w(b + ".mlp.fc1.bias", 4 * c.vision_width)
        w(b + ".mlp.fc2.weight", c.vision_width, 4 * c.vision_width)
        w(b + ".mlp.fc2.bias", c.vision_width)
    ap = f"{vt}.attn_pool"
    w(ap + ".latent", 1, 1, c.vision_width)
    w(ap + ".q.weight", c.vision_width, c.vision_width)
    w(ap + ".q.bias", c.vision_width)
    w(ap + ".kv.weight", 2 * c.vision_width, c.vision_width)
    w(ap + ".kv.bias", 2 * c.vision_width)
    w(ap + ".proj.weight", c.vision_width, c.vision_width)
    w(ap + ".proj.bias", c.vision_width)
    w(ap + ".norm.weight", c.vision_width)
    w(ap + ".norm.bias", c.vision_width)
    w(ap + ".mlp.fc1.weight", 4 * c.vision_width, c.vision_width)
    w(ap + ".mlp.fc1.bias", 4 * c.vision_width)
    w(ap + ".mlp.fc2.weight", c.vision_width, 4 * c.vision_width)
    w(ap + ".mlp.fc2.bias", c.vision_width)

    w("text.token_embedding.weight", c.vocab_size, c.text_width)
    w("text.positional_embedding", c.context_length, c.text_width)
    w("text.ln_final.weight", c.text_width)
    w("text.ln_final.bias", c.text_width)
    w("text.text_projection.weight", c.embed_dim, c.text_width)
    w("text.text_projection.bias", c.embed_dim)
    for i in range(c.text_layers):
        p = f"text.transformer.resblocks.{i}"
        for ln in (".ln_1", ".ln_2"):
            w(p + ln + ".weight", c.text_width)
            w(p + ln + ".bias", c.text_width)
        w(p + ".attn.in_proj_weight", 3 * c.text_width, c.text_width)
        w(p + ".attn.in_proj_bias", 3 * c.text_width)
        w(p + ".attn.out_proj.weight", c.text_width, c.text_width)
        w(p + ".attn.out_proj.bias", c.text_width)
        w(p + ".mlp.c_fc.weight", 4 * c.text_width, c.text_width)
        w(p + ".mlp.c_fc.bias", 4 * c.text_width)
        w(p + ".mlp.c_proj.weight", c.text_width, 4 * c.text_width)
        w(p + ".mlp.c_proj.bias", c.text_width)
    sd["logit_scale"] = np.float32(np.log(10.0))
    return sd


def test_converted_tree_matches_model():
    sd = _fake_siglip_sd(TINY)
    params = {"params": convert_openclip_state_dict(sd, TINY)}
    model = CLIP(TINY)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32),
    )
    flat_init = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(init)
    }
    flat_conv = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    assert flat_init == flat_conv, {
        "missing": sorted(set(flat_init) - set(flat_conv)),
        "extra": sorted(set(flat_conv) - set(flat_init)),
    }
    out = model.apply(
        params, jnp.ones((2, 32, 32, 3)), method=CLIP.encode_image
    )
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()
