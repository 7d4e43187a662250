"""XLM-RoBERTa text tower (open_clip HFTextEncoder-compatible).

The reference's default video/image extractor is
``mlfoundations/open_clip/xlm-roberta-large-ViT-H-14/frozen_laion5b_s13b_b90k``
(extract-features.py:195-207), whose text side is a HuggingFace XLM-RoBERTa
encoder with mean pooling and a bias-free projection (open_clip
HFTextEncoder). This is that tower in Flax: post-LN BERT-style blocks,
learned positions with the RoBERTa offset-2 convention, attention masking
over padding, mean pooling, projection to the joint space.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HFTextConfig:
    vocab_size: int = 250002
    width: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_positions: int = 514
    pad_token_id: int = 1
    embed_dim: int = 1024       # joint space
    dtype: Any = jnp.float32


class BertSelfAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = self.heads
        head_dim = self.width // h
        q = nn.Dense(self.width, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="value")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, head_dim)

        q, k, v = map(split, (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        logits = logits + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(x.shape[0], x.shape[1], self.width)


class BertLayer(nn.Module):
    config: HFTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.config
        attn = BertSelfAttention(c.width, c.heads, dtype=c.dtype, name="self")(
            x, mask
        )
        attn = nn.Dense(c.width, dtype=c.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_ln")(
            x + attn
        )
        h = nn.Dense(c.intermediate, dtype=c.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.width, dtype=c.dtype, name="output")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_ln")(x + h)
        return x


class XLMRobertaTextTower(nn.Module):
    config: HFTextConfig

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, L) int32, pad_token_id marks padding.
        Returns (B, embed_dim)."""
        c = self.config
        pad_mask = tokens != c.pad_token_id          # (B, L)
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (c.vocab_size, c.width),
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_positions, c.width),
        )
        # RoBERTa: positions count non-pad tokens, offset by pad_token_id + 1
        positions = jnp.cumsum(pad_mask.astype(jnp.int32), axis=1) * pad_mask
        positions = positions + c.pad_token_id
        x = word[tokens] + pos[positions]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="emb_ln")(x)
        x = x.astype(c.dtype)

        attn_mask = jnp.where(pad_mask[:, None, None, :], 0.0, -jnp.inf)
        for i in range(c.layers):
            x = BertLayer(c, name=f"layer_{i}")(x, attn_mask)

        # mean pooling over non-pad tokens (open_clip mean_pooler)
        denom = jnp.maximum(pad_mask.sum(axis=1, keepdims=True), 1)
        pooled = (x * pad_mask[..., None]).sum(axis=1) / denom
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.width, c.embed_dim)
        )
        return (pooled.astype(jnp.float32) @ proj.astype(jnp.float32))


def convert_hf_text_state_dict(sd, config: HFTextConfig):
    """open_clip HF tower keys (prefix 'text.') -> flax params for
    XLMRobertaTextTower."""

    def g(key):
        return np.asarray(sd[key], dtype=np.float32)

    def dense(prefix):
        return {"kernel": g(prefix + ".weight").T, "bias": g(prefix + ".bias")}

    def ln(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    base = "text.transformer"
    params = {
        "word_embeddings": g(f"{base}.embeddings.word_embeddings.weight"),
        "position_embeddings": g(f"{base}.embeddings.position_embeddings.weight"),
        "emb_ln": ln(f"{base}.embeddings.LayerNorm"),
        "proj": g("text.proj").T
        if "text.proj" in sd
        else g("text.proj.weight").T,
    }
    for i in range(config.layers):
        lp = f"{base}.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "self": {
                "query": dense(f"{lp}.attention.self.query"),
                "key": dense(f"{lp}.attention.self.key"),
                "value": dense(f"{lp}.attention.self.value"),
            },
            "attn_out": dense(f"{lp}.attention.output.dense"),
            "attn_ln": ln(f"{lp}.attention.output.LayerNorm"),
            "intermediate": dense(f"{lp}.intermediate.dense"),
            "output": dense(f"{lp}.output.dense"),
            "out_ln": ln(f"{lp}.output.LayerNorm"),
        }
    return params
