"""Numerics parity: CLAP caption tower (GPT2 layout) vs transformers
GPT2Model. GPT2's Conv1D stores weights (in, out) — exactly our Dense kernel
layout, so fused qkv/proj map without transposes.

Uses torch's 'gelu_new' (tanh approximation) on both sides — the activation
real GPT2 checkpoints were trained with.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wise_tpu.models.clap.model import CLAPConfig, CaptionEncoder

CFG = CLAPConfig(
    joint_dim=16,
    vocab_size=96,
    context_length=12,
    text_width=32,
    text_heads=4,
    text_layers=2,
)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def build_torch(flax_params):
    from transformers import GPT2Config, GPT2Model

    cfg = GPT2Config(
        vocab_size=CFG.vocab_size,
        n_positions=CFG.context_length,
        n_embd=CFG.text_width,
        n_layer=CFG.text_layers,
        n_head=CFG.text_heads,
        activation_function="gelu_new",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=1e-5,
    )
    hf = GPT2Model(cfg).eval()
    p = flax_params["params"]
    sd = {
        "wte.weight": _t(p["token_embedding"]),
        "wpe.weight": _t(p["positional_embedding"]),
        "ln_f.weight": _t(p["ln_f"]["scale"]),
        "ln_f.bias": _t(p["ln_f"]["bias"]),
    }
    for i in range(CFG.text_layers):
        b = p["transformer"][f"resblocks_{i}"]
        lp = f"h.{i}"
        # GPT2 Conv1D: weight (in, out) == our Dense kernel, no transpose
        sd[f"{lp}.attn.c_attn.weight"] = _t(b["attn"]["in_proj"]["kernel"])
        sd[f"{lp}.attn.c_attn.bias"] = _t(b["attn"]["in_proj"]["bias"])
        sd[f"{lp}.attn.c_proj.weight"] = _t(b["attn"]["out_proj"]["kernel"])
        sd[f"{lp}.attn.c_proj.bias"] = _t(b["attn"]["out_proj"]["bias"])
        sd[f"{lp}.ln_1.weight"] = _t(b["ln_1"]["scale"])
        sd[f"{lp}.ln_1.bias"] = _t(b["ln_1"]["bias"])
        sd[f"{lp}.ln_2.weight"] = _t(b["ln_2"]["scale"])
        sd[f"{lp}.ln_2.bias"] = _t(b["ln_2"]["bias"])
        sd[f"{lp}.mlp.c_fc.weight"] = _t(b["mlp_fc"]["kernel"])
        sd[f"{lp}.mlp.c_fc.bias"] = _t(b["mlp_fc"]["bias"])
        sd[f"{lp}.mlp.c_proj.weight"] = _t(b["mlp_proj"]["kernel"])
        sd[f"{lp}.mlp.c_proj.bias"] = _t(b["mlp_proj"]["bias"])
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    real_missing = [
        m for m in missing if "attn.bias" not in m and "masked_bias" not in m
    ]
    assert not real_missing, real_missing
    assert not unexpected, unexpected
    return hf


def test_caption_tower_matches_gpt2():
    enc = CaptionEncoder(CFG)
    toks = np.array(
        [[3, 7, 11, 2, 0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int32
    )
    lengths = np.array([4], dtype=np.int32)
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(toks), jnp.asarray(lengths)
    )
    hf = build_torch(params)

    ours = np.asarray(enc.apply(params, jnp.asarray(toks), jnp.asarray(lengths)))
    with torch.inference_mode():
        hidden = hf(
            input_ids=torch.tensor(toks, dtype=torch.long)
        ).last_hidden_state.numpy()
    theirs = hidden[np.arange(1), lengths - 1]
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
