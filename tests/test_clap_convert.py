"""msclap-layout checkpoint conversion: tree/shape compatibility with our
CLAP model (key names synthesized in msclap's naming scheme)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wise_tpu.models.clap.convert import convert_msclap_state_dict
from wise_tpu.models.clap.model import CLAP, CLAPConfig

TINY = CLAPConfig(
    joint_dim=16,
    spec_frames=64,
    freq_ratio=2,
    n_mels=32,
    patch_size=4,
    embed_dim=8,
    depths=(1, 1),
    num_heads=(2, 4),
    window_size=4,
    vocab_size=96,
    context_length=12,
    text_width=32,
    text_heads=4,
    text_layers=2,
)


def _fake_msclap_sd(c: CLAPConfig):
    rng = np.random.default_rng(0)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    # caption tower: GPT2 under caption_encoder.base.
    b = "caption_encoder.base."
    w(b + "wte.weight", c.vocab_size, c.text_width)
    w(b + "wpe.weight", c.context_length, c.text_width)
    w(b + "ln_f.weight", c.text_width)
    w(b + "ln_f.bias", c.text_width)
    for i in range(c.text_layers):
        lp = f"{b}h.{i}"
        for ln in (".ln_1", ".ln_2"):
            w(lp + ln + ".weight", c.text_width)
            w(lp + ln + ".bias", c.text_width)
        w(lp + ".attn.c_attn.weight", c.text_width, 3 * c.text_width)
        w(lp + ".attn.c_attn.bias", 3 * c.text_width)
        w(lp + ".attn.c_proj.weight", c.text_width, c.text_width)
        w(lp + ".attn.c_proj.bias", c.text_width)
        w(lp + ".mlp.c_fc.weight", c.text_width, 4 * c.text_width)
        w(lp + ".mlp.c_fc.bias", 4 * c.text_width)
        w(lp + ".mlp.c_proj.weight", 4 * c.text_width, c.text_width)
        w(lp + ".mlp.c_proj.bias", c.text_width)
    # audio tower: HTSAT-style Swin under audio_encoder.base.
    a = "audio_encoder.base."
    # bn0 running stats (folded into the per-bin affine by the converter)
    w(a + "bn0.weight", c.n_mels)
    w(a + "bn0.bias", c.n_mels)
    sd[a + "bn0.running_mean"] = rng.standard_normal(c.n_mels).astype(np.float32)
    sd[a + "bn0.running_var"] = np.abs(rng.standard_normal(c.n_mels)).astype(np.float32) + 0.5
    w(a + "patch_embed.proj.weight", c.embed_dim, 1, c.patch_size, c.patch_size)
    w(a + "patch_embed.proj.bias", c.embed_dim)
    w(a + "patch_embed.norm.weight", c.embed_dim)
    w(a + "patch_embed.norm.bias", c.embed_dim)
    final = c.embed_dim * (2 ** (len(c.depths) - 1))
    w(a + "norm.weight", final)
    w(a + "norm.bias", final)
    dim = c.embed_dim
    for stage, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
        for blk in range(depth):
            lp = f"{a}layers.{stage}.blocks.{blk}"
            for ln in (".norm1", ".norm2"):
                w(lp + ln + ".weight", dim)
                w(lp + ln + ".bias", dim)
            w(lp + ".attn.qkv.weight", 3 * dim, dim)
            w(lp + ".attn.qkv.bias", 3 * dim)
            w(lp + ".attn.proj.weight", dim, dim)
            w(lp + ".attn.proj.bias", dim)
            w(lp + ".attn.relative_position_bias_table",
              (2 * c.window_size - 1) ** 2, heads)
            w(lp + ".mlp.fc1.weight", 4 * dim, dim)
            w(lp + ".mlp.fc1.bias", 4 * dim)
            w(lp + ".mlp.fc2.weight", dim, 4 * dim)
            w(lp + ".mlp.fc2.bias", dim)
        if stage < len(c.depths) - 1:
            d = f"{a}layers.{stage}.downsample"
            w(d + ".norm.weight", 4 * dim)
            w(d + ".norm.bias", 4 * dim)
            w(d + ".reduction.weight", 2 * dim, 4 * dim)
            dim *= 2
    final_dim = c.embed_dim * (2 ** (len(c.depths) - 1))
    for tower, d_in in (("caption_encoder", c.text_width),
                        ("audio_encoder", final_dim)):
        pp = f"{tower}.projection."
        w(pp + "linear1.weight", c.joint_dim, d_in)
        w(pp + "linear1.bias", c.joint_dim)
        w(pp + "linear2.weight", c.joint_dim, c.joint_dim)
        w(pp + "linear2.bias", c.joint_dim)
        w(pp + "layer_norm.weight", c.joint_dim)
        w(pp + "layer_norm.bias", c.joint_dim)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return sd


def test_converted_tree_matches_model():
    sd = _fake_msclap_sd(TINY)
    params = {"params": convert_msclap_state_dict(sd, TINY)}
    model = CLAP(TINY)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, TINY.n_mels), jnp.float32),
        jnp.zeros((1, TINY.context_length), jnp.int32),
        jnp.ones((1,), jnp.int32),
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
        "shape_mismatch": {
            k: (flat_init[k], flat_conv[k])
            for k in set(flat_init) & set(flat_conv)
            if flat_init[k] != flat_conv[k]
        },
    }
    # converted model runs
    a, t, scale = model.apply(
        params,
        jnp.zeros((1, 16, TINY.n_mels), jnp.float32),
        jnp.array([[3, 7, 2] + [0] * 9], jnp.int32),
        jnp.array([3], jnp.int32),
    )
    assert a.shape == (1, 16) and t.shape == (1, 16)
    assert np.isfinite(np.asarray(a)).all()
