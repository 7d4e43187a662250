"""XLM-RoBERTa text tower (open_clip HFTextEncoder-compatible).

The reference's default video/image extractor is
``mlfoundations/open_clip/xlm-roberta-large-ViT-H-14/frozen_laion5b_s13b_b90k``
(reference extract-features.py:195-207), whose text side is a HuggingFace
XLM-RoBERTa encoder with mean pooling and a bias-free projection
(open_clip HFTextEncoder). This is that tower in Flax: post-LN BERT-style
blocks, learned positions with the RoBERTa offset-2 convention, attention
masking over padding, mean pooling, projection to the joint space.

bf16 towers run each residual block as fused post-LN Pallas kernels
(ops/postln_block.py — qkv/attention/out-proj/residual/LN in one VMEM
program, fc/gelu/proj/residual/LN in another) when
``supports_fused_postln`` admits the shape; both paths read the SAME
parameter tree (the param-declaration helpers mirror nn.Dense /
nn.LayerNorm exactly), so checkpoints are interchangeable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import postln_block as _pb


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
    #: open_clip HFTextEncoder projection head: "linear" (one bias-free
    #: matrix, saved as ``text.proj``/``text.proj.weight``) or "mlp"
    #: (Linear -> GELU -> Linear, both bias-free, hidden width
    #: (width+embed_dim)//2, saved as ``text.proj.0.weight`` /
    #: ``text.proj.2.weight``). The PUBLISHED
    #: xlm-roberta-large-ViT-H-14/frozen_laion5b checkpoint — the
    #: reference's default backbone — uses "mlp" (open_clip
    #: model_configs/xlm-roberta-large-ViT-H-14.json: "proj": "mlp").
    proj_type: str = "linear"
    dtype: Any = jnp.float32
    #: run residual blocks as fused post-LN kernels where shapes allow
    #: (bf16 only; ops/postln_block.supports_fused_postln)
    fused_block: bool = False


class _DenseParams(nn.Module):
    """Exactly nn.Dense's variables (names/shapes/initializers) without
    computing — both compute paths read them, one checkpoint layout."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_features, self.features),
            ),
            self.param("bias", nn.initializers.zeros_init(),
                       (self.features,)),
        )


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.dim,)),
            self.param("bias", nn.initializers.zeros_init(), (self.dim,)),
        )


class _SelfAttnParams(nn.Module):
    """HF layout: separate query/key/value Dense under 'self'."""

    width: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.width, self.width, name="query")(),
            _DenseParams(self.width, self.width, name="key")(),
            _DenseParams(self.width, self.width, name="value")(),
        )


def _ln_f32(xf, scale, bias, eps=1e-5):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean,
                      0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


class BertLayer(nn.Module):
    """One post-LN block. ``km`` is the per-example additive f32 key mask
    (B, 1, SP): 0 at real tokens, -inf at padding."""

    config: HFTextConfig

    @nn.compact
    def __call__(self, x, km):
        c = self.config
        dt = c.dtype
        (wq, bq), (wk, bk), (wv, bv) = _SelfAttnParams(
            c.width, name="self")()
        wo, bo = _DenseParams(c.width, c.width, name="attn_out")()
        ln1_s, ln1_b = _LNParams(c.width, name="attn_ln")()
        wfc, bfc = _DenseParams(c.width, c.intermediate,
                                name="intermediate")()
        wproj, bproj = _DenseParams(c.intermediate, c.width,
                                    name="output")()
        ln2_s, ln2_b = _LNParams(c.width, name="out_ln")()

        b, sp = x.shape[0], x.shape[1]
        if (
            c.fused_block
            and _pb.supports_fused_postln(b, sp, c.width, c.heads, dt)
        ):
            wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(dt)
            # _train wrappers: identical forward graph; adds the
            # recompute custom VJP so fine-tuning traces (postln_block.py)
            x = _pb.fused_postln_attn_block_train(
                x, km, ln1_s, ln1_b, wqkv, bqkv,
                wo.astype(dt), bo.astype(dt), c.heads,
            )
            return _pb.fused_postln_mlp_block_train(
                x, ln2_s, ln2_b, wfc.astype(dt), bfc.astype(dt),
                wproj.astype(dt), bproj.astype(dt), "gelu",
            )

        # plain-ops path (f32 / CPU / unadmitted shapes) — identical math
        # to the pre-round-3 nn.Dense/nn.LayerNorm formulation
        h = c.heads
        hd = c.width // h
        q = (x @ wq.astype(dt) + bq.astype(dt)).reshape(b, sp, h, hd)
        k = (x @ wk.astype(dt) + bk.astype(dt)).reshape(b, sp, h, hd)
        v = (x @ wv.astype(dt) + bv.astype(dt)).reshape(b, sp, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        logits = logits + km[:, :, None, :].astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            dt
        )
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sp, c.width)
        att = att @ wo.astype(dt) + bo.astype(dt)
        x = _ln_f32((x + att).astype(jnp.float32), ln1_s, ln1_b).astype(dt)
        m = x @ wfc.astype(dt) + bfc.astype(dt)
        m = jax.nn.gelu(m, approximate=False)
        m = m @ wproj.astype(dt) + bproj.astype(dt)
        return _ln_f32((x + m).astype(jnp.float32), ln2_s, ln2_b).astype(dt)


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

        km = jnp.where(pad_mask[:, None, :], 0.0, -jnp.inf).astype(
            jnp.float32
        )
        for i in range(c.layers):
            x = BertLayer(c, name=f"layer_{i}")(x, km)

        # mean pooling over non-pad tokens (open_clip mean_pooler) — f32
        # accumulation regardless of the tower dtype
        denom = jnp.maximum(pad_mask.sum(axis=1, keepdims=True), 1)
        pooled = (
            (x.astype(jnp.float32) * pad_mask[..., None]).sum(axis=1) / denom
        )
        pooled = pooled.astype(jnp.float32)
        if c.proj_type == "mlp":
            # open_clip HFTextEncoder proj == nn.Sequential(
            #   Linear(width, hidden, bias=False), GELU(),
            #   Linear(hidden, embed_dim, bias=False)) with
            # hidden = (width + embed_dim) // 2; exact-erf GELU (torch
            # nn.GELU default). f32 like the linear head.
            hidden = (c.width + c.embed_dim) // 2
            fc = self.param(
                "proj_fc", nn.initializers.normal(0.02), (c.width, hidden)
            )
            out_w = self.param(
                "proj_out", nn.initializers.normal(0.02),
                (hidden, c.embed_dim),
            )
            h = jax.nn.gelu(pooled @ fc.astype(jnp.float32),
                            approximate=False)
            return h @ out_w.astype(jnp.float32)
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.width, c.embed_dim)
        )
        return pooled @ proj.astype(jnp.float32)


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
    }
    # projection head naming depends on open_clip's proj type: "mlp" saves
    # the Sequential's members as text.proj.0 / text.proj.2 (bias-free),
    # "linear" as text.proj (raw matrix) or text.proj.weight
    if "text.proj.0.weight" in sd:
        if config.proj_type != "mlp":
            raise KeyError(
                "checkpoint has an MLP text projection (text.proj.0.*) but "
                "config.proj_type is %r — use hf_proj_type='mlp'"
                % config.proj_type
            )
        params["proj_fc"] = g("text.proj.0.weight").T
        params["proj_out"] = g("text.proj.2.weight").T
    else:
        if config.proj_type == "mlp":
            raise KeyError(
                "config.proj_type is 'mlp' but the checkpoint has a "
                "linear text projection (no text.proj.0.*) — drop "
                "hf_proj_type='mlp' (the reverse mismatch raises above; "
                "without this check it would surface later as a missing "
                "'proj_fc' param deep inside model.apply)"
            )
        params["proj"] = g(
            "text.proj" if "text.proj" in sd else "text.proj.weight"
        ).T
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
