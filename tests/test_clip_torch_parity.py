"""Numerics parity: our Flax CLIP vs the PyTorch reference implementation.

Builds a tiny CLIP, copies OUR random weights into a transformers CLIPModel
(the torch implementation of the same architecture the reference serves
through open_clip), and requires matching embeddings — the hermetic
equivalent of SURVEY.md's "numerics matched so top-k ordering is preserved"
requirement, without downloading checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wise_tpu.models.clip.model import CLIP, CLIPConfig

CFG = CLIPConfig(
    embed_dim=32,
    image_size=32,
    patch_size=16,
    vision_width=48,
    vision_layers=2,
    vision_heads=4,
    context_length=16,
    vocab_size=128,
    text_width=32,
    text_heads=4,
    text_layers=2,
    quick_gelu=False,
)
EOT = 127


def _to_t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def build_torch_model(flax_params):
    from transformers import CLIPConfig as HFConfig, CLIPModel

    hf_cfg = HFConfig(
        projection_dim=CFG.embed_dim,
        text_config={
            "vocab_size": CFG.vocab_size,
            "hidden_size": CFG.text_width,
            "intermediate_size": CFG.text_width * 4,
            "num_hidden_layers": CFG.text_layers,
            "num_attention_heads": CFG.text_heads,
            "max_position_embeddings": CFG.context_length,
            "hidden_act": "gelu",
            "eos_token_id": EOT,
            "bos_token_id": 126,
            "pad_token_id": 0,
        },
        vision_config={
            "hidden_size": CFG.vision_width,
            "intermediate_size": CFG.vision_width * 4,
            "num_hidden_layers": CFG.vision_layers,
            "num_attention_heads": CFG.vision_heads,
            "image_size": CFG.image_size,
            "patch_size": CFG.patch_size,
            "hidden_act": "gelu",
        },
    )
    hf = CLIPModel(hf_cfg).eval()
    p = flax_params["params"]
    sd = {}

    def dense(prefix, tree):
        sd[prefix + ".weight"] = _to_t(tree["kernel"]).T
        sd[prefix + ".bias"] = _to_t(tree["bias"])

    def ln(prefix, tree):
        sd[prefix + ".weight"] = _to_t(tree["scale"])
        sd[prefix + ".bias"] = _to_t(tree["bias"])

    def tower(prefix, tree, layers, width):
        for i in range(layers):
            b = tree["transformer"][f"resblocks_{i}"]
            lp = f"{prefix}.encoder.layers.{i}"
            qkv_k = np.asarray(b["attn"]["in_proj"]["kernel"])  # (D, 3D)
            qkv_b = np.asarray(b["attn"]["in_proj"]["bias"])
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                sd[f"{lp}.self_attn.{name}.weight"] = _to_t(
                    qkv_k[:, j * width : (j + 1) * width]
                ).T
                sd[f"{lp}.self_attn.{name}.bias"] = _to_t(
                    qkv_b[j * width : (j + 1) * width]
                )
            dense(f"{lp}.self_attn.out_proj", b["attn"]["out_proj"])
            ln(f"{lp}.layer_norm1", b["ln_1"])
            ln(f"{lp}.layer_norm2", b["ln_2"])
            dense(f"{lp}.mlp.fc1", b["mlp_fc"])
            dense(f"{lp}.mlp.fc2", b["mlp_proj"])

    v = p["visual"]
    sd["vision_model.embeddings.class_embedding"] = _to_t(v["class_embedding"])
    sd["vision_model.embeddings.patch_embedding.weight"] = _to_t(
        np.transpose(np.asarray(v["conv1"]["kernel"]), (3, 2, 0, 1))
    )
    sd["vision_model.embeddings.position_embedding.weight"] = _to_t(
        v["positional_embedding"]
    )
    ln("vision_model.pre_layrnorm", v["ln_pre"])
    tower("vision_model", v, CFG.vision_layers, CFG.vision_width)
    ln("vision_model.post_layernorm", v["ln_post"])
    sd["visual_projection.weight"] = _to_t(v["proj"]).T

    t = p["text"]
    sd["text_model.embeddings.token_embedding.weight"] = _to_t(
        t["token_embedding"]
    )
    sd["text_model.embeddings.position_embedding.weight"] = _to_t(
        t["positional_embedding"]
    )
    tower("text_model", t, CFG.text_layers, CFG.text_width)
    ln("text_model.final_layer_norm", t["ln_final"])
    sd["text_projection.weight"] = _to_t(t["text_projection"]).T
    sd["logit_scale"] = _to_t(p["logit_scale"])

    missing, unexpected = hf.load_state_dict(sd, strict=False)
    # position_ids buffers may be "missing" (generated); nothing else should be
    real_missing = [m for m in missing if "position_ids" not in m]
    assert not real_missing, f"unmapped torch params: {real_missing}"
    assert not unexpected, f"unexpected keys: {unexpected}"
    return hf


@pytest.fixture(scope="module")
def models():
    model = CLIP(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.float32),
        jnp.zeros((1, CFG.context_length), jnp.int32),
    )
    hf = build_torch_model(params)
    return model, params, hf


def test_image_tower_matches_torch(models):
    model, params, hf = models
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal(
        (3, CFG.image_size, CFG.image_size, 3)
    ).astype(np.float32)
    ours = np.asarray(
        model.apply(params, jnp.asarray(imgs), False,
                    method=CLIP.encode_image)
    )
    with torch.inference_mode():
        theirs = hf.get_image_features(
            pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_text_tower_matches_torch(models):
    model, params, hf = models
    toks = np.array(
        [
            [126, 5, 9, 3, EOT, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [126, 77, 41, 2, 8, 99, EOT, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        dtype=np.int32,
    )
    ours = np.asarray(
        model.apply(params, jnp.asarray(toks), False, method=CLIP.encode_text)
    )
    with torch.inference_mode():
        theirs = hf.get_text_features(
            input_ids=torch.tensor(toks, dtype=torch.long)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_similarity_ranking_matches_torch(models):
    """The quantity that decides retrieval order — image/text cosine
    similarities — must rank identically."""
    model, params, hf = models
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal(
        (4, CFG.image_size, CFG.image_size, 3)
    ).astype(np.float32)
    toks = np.zeros((1, CFG.context_length), dtype=np.int32)
    toks[0, :4] = [126, 55, 23, EOT]
    img_f = np.asarray(
        model.apply(params, jnp.asarray(imgs), method=CLIP.encode_image)
    )
    txt_f = np.asarray(
        model.apply(params, jnp.asarray(toks), method=CLIP.encode_text)
    )
    ours_scores = (txt_f @ img_f.T)[0]
    with torch.inference_mode():
        t_img = hf.get_image_features(
            pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2)
        )
        t_txt = hf.get_text_features(
            input_ids=torch.tensor(toks, dtype=torch.long)
        )
        t_img = t_img / t_img.norm(dim=-1, keepdim=True)
        t_txt = t_txt / t_txt.norm(dim=-1, keepdim=True)
        theirs_scores = (t_txt @ t_img.T)[0].numpy()
    np.testing.assert_allclose(ours_scores, theirs_scores, atol=2e-4)
    np.testing.assert_array_equal(
        np.argsort(-ours_scores), np.argsort(-theirs_scores)
    )
