"""Numerics parity: our SigLIP variant vs transformers' Siglip towers
(MAP attention-pool head, non-causal gelu_tanh text tower, biased text head).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wise_tpu.models.clip.model import CLIP, CLIPConfig

CFG = CLIPConfig(
    embed_dim=32,               # == widths: SigLIP pools to tower width
    image_size=32,
    patch_size=16,
    vision_width=32,
    vision_layers=2,
    vision_heads=4,
    context_length=12,
    vocab_size=96,
    text_width=32,
    text_heads=4,
    text_layers=2,
    vision_pool="map",
    text_causal=False,
    text_pool="last",
    act="gelu_tanh",
    text_proj_bias=True,
)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def _tower_sd(prefix, tree, layers, width):
    sd = {}
    for i in range(layers):
        b = tree["transformer"][f"resblocks_{i}"]
        lp = f"{prefix}.encoder.layers.{i}"
        qkv_k = np.asarray(b["attn"]["in_proj"]["kernel"])
        qkv_b = np.asarray(b["attn"]["in_proj"]["bias"])
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{lp}.self_attn.{name}.weight"] = _t(
                qkv_k[:, j * width : (j + 1) * width]
            ).T
            sd[f"{lp}.self_attn.{name}.bias"] = _t(
                qkv_b[j * width : (j + 1) * width]
            )
        sd[f"{lp}.self_attn.out_proj.weight"] = _t(
            b["attn"]["out_proj"]["kernel"]
        ).T
        sd[f"{lp}.self_attn.out_proj.bias"] = _t(b["attn"]["out_proj"]["bias"])
        sd[f"{lp}.layer_norm1.weight"] = _t(b["ln_1"]["scale"])
        sd[f"{lp}.layer_norm1.bias"] = _t(b["ln_1"]["bias"])
        sd[f"{lp}.layer_norm2.weight"] = _t(b["ln_2"]["scale"])
        sd[f"{lp}.layer_norm2.bias"] = _t(b["ln_2"]["bias"])
        sd[f"{lp}.mlp.fc1.weight"] = _t(b["mlp_fc"]["kernel"]).T
        sd[f"{lp}.mlp.fc1.bias"] = _t(b["mlp_fc"]["bias"])
        sd[f"{lp}.mlp.fc2.weight"] = _t(b["mlp_proj"]["kernel"]).T
        sd[f"{lp}.mlp.fc2.bias"] = _t(b["mlp_proj"]["bias"])
    return sd


@pytest.fixture(scope="module")
def models():
    model = CLIP(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32),
        jnp.zeros((1, CFG.context_length), jnp.int32),
    )
    return model, params


def test_vision_tower_matches_siglip(models):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    model, params = models
    v = params["params"]["visual"]
    hf_cfg = SiglipVisionConfig(
        hidden_size=CFG.vision_width,
        intermediate_size=CFG.vision_width * 4,
        num_hidden_layers=CFG.vision_layers,
        num_attention_heads=CFG.vision_heads,
        image_size=CFG.image_size,
        patch_size=CFG.patch_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=1e-5,
    )
    hf = SiglipVisionModel(hf_cfg).eval()
    sd = {
        "vision_model.embeddings.patch_embedding.weight": _t(
            np.transpose(np.asarray(v["conv1"]["kernel"]), (3, 2, 0, 1))
        ),
        "vision_model.embeddings.patch_embedding.bias": _t(
            v["conv1"]["bias"]
        ),
        "vision_model.embeddings.position_embedding.weight": _t(
            v["positional_embedding"]
        ),
        "vision_model.post_layernorm.weight": _t(v["ln_post"]["scale"]),
        "vision_model.post_layernorm.bias": _t(v["ln_post"]["bias"]),
    }
    sd.update(_tower_sd("vision_model", v, CFG.vision_layers, CFG.vision_width))
    # MAP head: ours splits q vs fused kv; HF fuses qkv in MultiheadAttention
    mp = v["attn_pool"]
    hp = "vision_model.head"
    sd[f"{hp}.probe"] = _t(np.asarray(mp["probe"])[None])
    qk = np.asarray(mp["q_proj"]["kernel"])
    kvk = np.asarray(mp["kv_proj"]["kernel"])
    in_w = np.concatenate([qk, kvk[:, : CFG.vision_width],
                           kvk[:, CFG.vision_width :]], axis=1)
    in_b = np.concatenate([
        np.asarray(mp["q_proj"]["bias"]),
        np.asarray(mp["kv_proj"]["bias"]),
    ])
    sd[f"{hp}.attention.in_proj_weight"] = _t(in_w).T
    sd[f"{hp}.attention.in_proj_bias"] = _t(in_b)
    sd[f"{hp}.attention.out_proj.weight"] = _t(mp["out_proj"]["kernel"]).T
    sd[f"{hp}.attention.out_proj.bias"] = _t(mp["out_proj"]["bias"])
    sd[f"{hp}.layernorm.weight"] = _t(mp["norm"]["scale"])
    sd[f"{hp}.layernorm.bias"] = _t(mp["norm"]["bias"])
    sd[f"{hp}.mlp.fc1.weight"] = _t(mp["mlp_fc"]["kernel"]).T
    sd[f"{hp}.mlp.fc1.bias"] = _t(mp["mlp_fc"]["bias"])
    sd[f"{hp}.mlp.fc2.weight"] = _t(mp["mlp_proj"]["kernel"]).T
    sd[f"{hp}.mlp.fc2.bias"] = _t(mp["mlp_proj"]["bias"])
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "position_ids" not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal(
        (2, CFG.image_size, CFG.image_size, 3)
    ).astype(np.float32)
    # our visual tower output BEFORE the (identity-free) proj: apply proj=I
    import flax

    p2 = flax.core.unfreeze(params)
    p2["params"]["visual"]["proj"] = np.eye(CFG.vision_width, dtype=np.float32)
    ours = np.asarray(
        model.apply(p2, jnp.asarray(imgs), False, method=CLIP.encode_image)
    )
    with torch.inference_mode():
        theirs = hf(
            pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_text_tower_matches_siglip(models):
    from transformers import SiglipTextConfig, SiglipTextModel

    model, params = models
    t = params["params"]["text"]
    hf_cfg = SiglipTextConfig(
        hidden_size=CFG.text_width,
        intermediate_size=CFG.text_width * 4,
        num_hidden_layers=CFG.text_layers,
        num_attention_heads=CFG.text_heads,
        max_position_embeddings=CFG.context_length,
        vocab_size=CFG.vocab_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=1e-5,
        projection_size=CFG.embed_dim,
    )
    hf = SiglipTextModel(hf_cfg).eval()
    sd = {
        "text_model.embeddings.token_embedding.weight": _t(
            t["token_embedding"]
        ),
        "text_model.embeddings.position_embedding.weight": _t(
            t["positional_embedding"]
        ),
        "text_model.final_layer_norm.weight": _t(t["ln_final"]["scale"]),
        "text_model.final_layer_norm.bias": _t(t["ln_final"]["bias"]),
        "text_model.head.weight": _t(t["text_projection"]).T,
        "text_model.head.bias": _t(t["text_projection_bias"]),
    }
    sd.update(_tower_sd("text_model", t, CFG.text_layers, CFG.text_width))
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "position_ids" not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected

    toks = np.array(
        [[3, 7, 11, 2, 5, 9, 1, 4, 8, 6, 10, 12]], dtype=np.int32
    )
    ours = np.asarray(
        model.apply(params, jnp.asarray(toks), False, method=CLIP.encode_text)
    )
    with torch.inference_mode():
        theirs = hf(
            input_ids=torch.tensor(toks, dtype=torch.long)
        ).pooler_output.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
