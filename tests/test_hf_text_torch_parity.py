"""Numerics parity: our Flax XLM-RoBERTa text tower vs transformers'
XLMRobertaModel (the torch implementation open_clip wraps for the
reference's default xlm-roberta-large-ViT-H-14 extractor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wise_tpu.models.clip.hf_text import HFTextConfig, XLMRobertaTextTower

CFG = HFTextConfig(
    vocab_size=120,
    width=32,
    layers=2,
    heads=4,
    intermediate=64,
    max_positions=24,
    pad_token_id=1,
    embed_dim=16,
)


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def build_torch(flax_params):
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.width,
        num_hidden_layers=CFG.layers,
        num_attention_heads=CFG.heads,
        intermediate_size=CFG.intermediate,
        max_position_embeddings=CFG.max_positions,
        pad_token_id=CFG.pad_token_id,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    p = flax_params["params"]
    sd = {}

    def dense(prefix, tree):
        sd[prefix + ".weight"] = _t(tree["kernel"]).T
        sd[prefix + ".bias"] = _t(tree["bias"])

    def ln(prefix, tree):
        sd[prefix + ".weight"] = _t(tree["scale"])
        sd[prefix + ".bias"] = _t(tree["bias"])

    sd["embeddings.word_embeddings.weight"] = _t(p["word_embeddings"])
    sd["embeddings.position_embeddings.weight"] = _t(p["position_embeddings"])
    # our tower has no token-type embedding; zero it in torch
    sd["embeddings.token_type_embeddings.weight"] = torch.zeros(
        (cfg.type_vocab_size, CFG.width)
    )
    ln("embeddings.LayerNorm", p["emb_ln"])
    for i in range(CFG.layers):
        lp = f"encoder.layer.{i}"
        fl = p[f"layer_{i}"]
        dense(f"{lp}.attention.self.query", fl["self"]["query"])
        dense(f"{lp}.attention.self.key", fl["self"]["key"])
        dense(f"{lp}.attention.self.value", fl["self"]["value"])
        dense(f"{lp}.attention.output.dense", fl["attn_out"])
        ln(f"{lp}.attention.output.LayerNorm", fl["attn_ln"])
        dense(f"{lp}.intermediate.dense", fl["intermediate"])
        dense(f"{lp}.output.dense", fl["output"])
        ln(f"{lp}.output.LayerNorm", fl["out_ln"])
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "position_ids" not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected
    return hf


def test_tower_matches_torch_mean_pool():
    tower = XLMRobertaTextTower(CFG)
    params = tower.init(jax.random.PRNGKey(0), jnp.ones((1, 12), jnp.int32))
    hf = build_torch(params)

    toks = np.array(
        [
            [0, 5, 9, 3, 2, 1, 1, 1, 1, 1, 1, 1],
            [0, 77, 41, 3, 8, 99, 54, 2, 1, 1, 1, 1],
        ],
        dtype=np.int32,
    )
    mask = (toks != CFG.pad_token_id).astype(np.float32)

    ours = np.asarray(tower.apply(params, jnp.asarray(toks)))

    with torch.inference_mode():
        out = hf(
            input_ids=torch.tensor(toks, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    # open_clip mean_pooler: mean over non-pad tokens, then our projection
    pooled = (out * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
    proj = np.asarray(params["params"]["proj"])
    theirs = pooled @ proj
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
