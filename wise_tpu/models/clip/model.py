"""CLIP (image + text towers) in Flax linen — OpenCLIP-compatible.

Architecture matches open_clip's CLIP/VisionTransformer/TextTransformer so
that published checkpoints (e.g. ViT-B-32/laion2b_s34b_b79k, the reference's
extractor backbones, src/feature/mlfoundation_openclip.py:25-108) convert
weight-for-weight via convert.py. TPU-first choices:

- whole towers run under one jit; bfloat16 activations with float32
  LayerNorm/softmax accumulation (precision knob), so matmuls hit the MXU;
- no data-dependent control flow; static shapes everywhere (text always
  padded to context_length);
- batch dimension shardable over the mesh 'dp' axis, head/MLP dims over
  'mp' (see wise_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    quick_gelu: bool = False
    #: activation override: "" (use quick_gelu flag), "gelu", "quick_gelu",
    #: "gelu_tanh" (SigLIP / GPT2 'gelu_new')
    act: str = ""
    #: SigLIP text head is a biased Linear; CLIP text_projection is bias-free
    text_proj_bias: bool = False
    #: "clip" (causal transformer, argmax/EOT pooling) or "hf_xlm_roberta"
    #: (open_clip HFTextEncoder-style tower, see hf_text.py)
    text_tower: str = "clip"
    #: hf text tower projection head: "linear" or "mlp" (open_clip
    #: HFTextEncoder proj types; the published xlm-roberta-large-ViT-H-14
    #: checkpoint uses "mlp" — see hf_text.HFTextConfig.proj_type)
    hf_proj_type: str = "linear"
    #: vision pooling: "cls" (class token, CLIP) or "map" (attention-pool
    #: latent head, SigLIP — no class token)
    vision_pool: str = "cls"
    #: text tower variants for SigLIP: non-causal attention, last-token pool
    text_causal: bool = True
    text_pool: str = "argmax"      # "argmax" (EOT) | "last"
    #: rematerialise transformer blocks (recompute activations in backward —
    #: trades FLOPs for memory when training large towers)
    remat: bool = False
    #: attention softmax accumulation: True = always f32 (parity-exact with
    #: torch autocast; the default), False = compute dtype (saves two cast
    #: passes over the (B,H,S,S) logits per layer in bf16 mode; no-op for
    #: f32 towers). Measured effect: BENCHMARKS.md roofline section.
    attn_softmax_f32: bool = True
    #: use the fused VMEM attention kernel (ops/attention.py) in the vision
    #: tower when shapes allow: bf16, head_dim 64, and a VMEM-feasible
    #: (group, seq_pad, width) tiling per ops.attention._pick_group — this
    #: admits short (ViT-B 50-token) through medium (ViT-L/14 264, SigLIP-384
    #: ~580) sequences, with the per-step group size shrinking as the
    #: working set grows. The token axis pads to a sublane multiple with
    #: key-masking. Note the kernel always runs an f32 softmax, so with
    #: attn_softmax_f32=False fused layers still softmax in f32 (measured
    #: ~1% difference, BENCHMARKS.md). ~4x faster attention middle at
    #: ViT-B/32 shapes; see BENCHMARKS.md.
    fused_attention: bool = False
    #: run whole residual blocks as two Pallas kernels (ops/block.py:
    #: LN1+QKV+attention+out-proj+residual, then LN2+MLP+residual) with the
    #: layer weights resident in VMEM — LayerNorms, gelu, and residual adds
    #: never round-trip HBM. Supersedes fused_attention per layer where
    #: ops.block.supports_fused_block admits the shapes (bf16, head_dim 64,
    #: VMEM-feasible tiling); other shapes fall back to the fused_attention
    #: / XLA paths. Inference only (no backward).
    fused_block: bool = False
    #: compute the patch embedding as an explicit patchify (reshape +
    #: transpose) followed by one (B*N, p*p*3) @ (p*p*3, D) matmul instead
    #: of lax.conv — identical math and parameter tree (the conv kernel is
    #: reshaped), but the matmul form lets XLA pick the MXU-native layout
    #: for the big GEMM instead of the convolution path. Measured effect:
    #: BENCHMARKS.md embed/head section.
    patch_embed_matmul: bool = False
    #: compute the LAST transformer layer only for the pooled row: a
    #: cls-pooled vision tower reads x[:, 0] after the transformer, so the
    #: final layer's attention output and MLP for every other (and padded)
    #: token are dead compute (~1 layer of the tower, ~2.9 ms of a 36 ms
    #: ViT-B/32 step). Identical math for the surviving row (k/v still
    #: cover all tokens). Applies to "cls" pooling only (MAP pooling
    #: consumes every token); inference default via
    #: production_clip_config (WISE_POOL_LAST=0 opts out).
    pool_last_block: bool = False
    #: carry the residual stream in ``dtype`` (bf16) through the fused
    #: kernel path instead of ln_pre's f32. MEASURED LOSS at ViT-B/32 —
    #: 37.77 vs 36.08 ms/step (scripts/bench_encoder_ab.py
    #: block+pool+f32s vs block+pool, cos 0.99996): the f32 stream costs
    #: 2x HBM bytes at every kernel boundary (22 f32 custom calls,
    #: scripts/audit_hlo.py) but is FREE on the MXU — DEFAULT-precision
    #: dots truncate operands to bf16 either way, and f32's 8-row sublane
    #: tiles keep SP=56 exact where bf16's 16-row tiles round it to 64
    #: (+14% GEMM rows). The boundary traffic evidently hides behind
    #: compute. Kept as a knob for shapes where the trade flips
    #: (WISE_BF16_STREAM=1 to enable).
    bf16_stream: bool = False
    dtype: Any = jnp.float32


# registry of standard OpenCLIP model shapes
CLIP_CONFIGS = {
    "ViT-B-32": CLIPConfig(),
    "ViT-B-16": CLIPConfig(patch_size=16),
    "ViT-L-14": CLIPConfig(
        embed_dim=768, patch_size=14, vision_width=1024, vision_layers=24,
        vision_heads=16, text_width=768, text_heads=12, text_layers=12,
    ),
    "ViT-H-14": CLIPConfig(
        embed_dim=1024, patch_size=14, vision_width=1280, vision_layers=32,
        vision_heads=16, text_width=1024, text_heads=16, text_layers=24,
    ),
    # the reference's default extractor backbone
    # (extract-features.py:195-207): ViT-H-14 vision + XLM-RoBERTa-large text
    "xlm-roberta-large-ViT-H-14": CLIPConfig(
        embed_dim=1024, patch_size=14, vision_width=1280, vision_layers=32,
        vision_heads=16, context_length=64, vocab_size=250002,
        text_width=1024, text_heads=16, text_layers=24,
        text_tower="hf_xlm_roberta", hf_proj_type="mlp",
    ),
    "ViT-L-14-336": CLIPConfig(
        embed_dim=768, image_size=336, patch_size=14, vision_width=1024,
        vision_layers=24, vision_heads=16, text_width=768, text_heads=12,
        text_layers=12,
    ),
    "ViT-g-14": CLIPConfig(
        embed_dim=1024, patch_size=14, vision_width=1408, vision_layers=40,
        vision_heads=16, text_width=1024, text_heads=16, text_layers=24,
    ),
    "ViT-bigG-14": CLIPConfig(
        embed_dim=1280, patch_size=14, vision_width=1664, vision_layers=48,
        vision_heads=16, text_width=1280, text_heads=20, text_layers=32,
    ),
    # SigLIP variants (reference's integration test uses ViT-L-16-SigLIP-384,
    # tests/test-kinetics-6.sh): MAP-pooled vision, non-causal last-pooled text
    "ViT-L-16-SigLIP-384": CLIPConfig(
        embed_dim=1024, image_size=384, patch_size=16, vision_width=1024,
        vision_layers=24, vision_heads=16, context_length=64,
        vocab_size=32000, text_width=1024, text_heads=16, text_layers=12,
        vision_pool="map", text_causal=False, text_pool="last",
        act="gelu_tanh", text_proj_bias=True,
    ),
    "ViT-B-16-SigLIP-256": CLIPConfig(
        embed_dim=768, image_size=256, patch_size=16, vision_width=768,
        vision_layers=12, vision_heads=12, context_length=64,
        vocab_size=32000, text_width=768, text_heads=12, text_layers=12,
        vision_pool="map", text_causal=False, text_pool="last",
        act="gelu_tanh", text_proj_bias=True,
    ),
    # Dress-rehearsal config for the real-weight validation kit
    # (tests/test_validation_kit.py): the kit's full glue — synthetic .pth
    # -> convert -> extract -> index -> search -> golden compare — runs
    # hermetically at this size where the networked run would use a
    # published checkpoint. Not a published model.
    "ViT-Test-Tiny": CLIPConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=64,
        vision_layers=2, vision_heads=4, context_length=16,
        vocab_size=1024, text_width=32, text_heads=4, text_layers=2,
    ),
    # OpenAI checkpoints use QuickGELU
    "ViT-B-32-quickgelu": CLIPConfig(quick_gelu=True),
    "ViT-B-16-quickgelu": CLIPConfig(patch_size=16, quick_gelu=True),
    "ViT-L-14-quickgelu": CLIPConfig(
        embed_dim=768, patch_size=14, vision_width=1024, vision_layers=24,
        vision_heads=16, text_width=768, text_heads=12, text_layers=12,
        quick_gelu=True,
    ),
    "ViT-H-14-quickgelu": CLIPConfig(
        embed_dim=1024, patch_size=14, vision_width=1280, vision_layers=32,
        vision_heads=16, text_width=1024, text_heads=16, text_layers=24,
        quick_gelu=True,
    ),
}


def get_clip_config(model_name: str) -> CLIPConfig:
    if model_name in CLIP_CONFIGS:
        return CLIP_CONFIGS[model_name]
    raise ValueError(
        f"unknown CLIP model {model_name}; known: {sorted(CLIP_CONFIGS)}"
    )


def _gelu(x, act):
    """act: False/'gelu' (exact), True/'quick_gelu' (sigmoid approx, OpenAI
    CLIP), 'gelu_tanh' (tanh approx — torch 'gelu_new', used by GPT2)."""
    if act is True or act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused in-projection, matching torch's
    nn.MultiheadAttention parameterisation (in_proj kernel (D, 3D)).

    ``n_valid`` (set by a padded vision tower) marks tokens >= n_valid as
    key-padding. When ``fused`` is on and ops/attention.py's kernel covers
    the shapes (bf16, head_dim 64, short sequence, batch % 8 == 0), the
    attention middle runs as one VMEM-resident Pallas kernel — logits
    never touch HBM (~4x faster than the XLA middle at ViT-B/32 shapes);
    otherwise the standard XLA path runs with an equivalent mask."""

    width: int
    heads: int
    dtype: Any = jnp.float32
    softmax_f32: bool = True
    fused: bool = False
    n_valid: Optional[int] = None
    #: the incoming mask is exactly the causal triangle — the fused kernel
    #: applies it natively instead of reading the mask array
    causal_fused: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        from ...ops.attention import (
            fused_attention_trainable,
            supports_fused,
            xla_attention,
        )

        D, H = self.width, self.heads
        in_proj = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(in_proj, 3, axis=-1)
        b, s = x.shape[0], x.shape[1]
        if (
            self.fused
            and (mask is None or self.causal_fused)
            and supports_fused(b, s, D, H, jnp.dtype(self.dtype))
        ):
            # differentiable wrapper: Pallas forward, recompute backward —
            # fine-tuning (parallel/train.py) runs the kernel too
            out = fused_attention_trainable(
                q, k, v, H, self.n_valid or s, self.causal_fused,
            )
        else:
            if self.n_valid is not None and self.n_valid < s:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3)
                pad_mask = jnp.where(col < self.n_valid, 0.0, -jnp.inf)
                mask = pad_mask if mask is None else mask + pad_mask
            out = xla_attention(
                q, k, v, heads=H, mask=mask,
                softmax_f32=self.softmax_f32, out_dtype=self.dtype,
            )
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's variables (kernel/bias, same names,
    shapes, and initializers) without computing — the fused-block path
    reads them directly so both paths share one checkpoint layout."""

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


class _MHAParams(nn.Module):
    """MultiHeadAttention's parameter tree (attn/in_proj, attn/out_proj)."""

    width: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.width, 3 * self.width, name="in_proj")(),
            _DenseParams(self.width, self.width, name="out_proj")(),
        )


class _LNParams(nn.Module):
    """nn.LayerNorm's variables (scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.dim,)),
            self.param("bias", nn.initializers.zeros_init(), (self.dim,)),
        )


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    quick_gelu: bool
    dtype: Any = jnp.float32
    softmax_f32: bool = True
    fused: bool = False
    fused_block: bool = False
    n_valid: Optional[int] = None
    causal_fused: bool = False
    #: when set, this block is the LAST layer of a statically-pooled tower
    #: and only the pooled row's output is consumed (cls pooling reads row
    #: 0; CLAP's caption tower reads the last real token). The block then
    #: computes attention q / out-proj / MLP for that single row (k/v stay
    #: full) and returns (B, D) instead of (B, S, D) — identical math for
    #: the surviving row, ~one layer of compute saved per tower pass.
    pool_row: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None, pool_rows=None):
        from ...ops.block import (
            fused_attn_block_padded_train,
            fused_attn_block_train,
            fused_mlp_block_train,
            supports_fused_block,
            supports_fused_block_padded,
        )

        if self.pool_row is not None or pool_rows is not None:
            return self._pooled(x, mask, pool_rows)
        b, s = x.shape[0], x.shape[1]
        attn_impl = None
        if self.fused_block and (mask is None or self.causal_fused):
            if supports_fused_block(b, s, self.width, self.heads,
                                    jnp.dtype(self.dtype)):
                attn_impl = fused_attn_block_train
            elif supports_fused_block_padded(b, s, self.width, self.heads,
                                             jnp.dtype(self.dtype)):
                # head_dim 72/80/88/104 towers (ViT-H/14 class — the
                # reference's default backbone): zero-padded 128-lane head
                # slots, five-kernel decomposition (ops/block.py padded
                # section). Calibration-gated like the monolithic path.
                attn_impl = fused_attn_block_padded_train
        if attn_impl is not None:
            import os

            # Both halves of the layer run as Pallas kernels (same
            # parameter tree, read directly). Keeping the MLP in a kernel
            # matters for a non-obvious reason: standalone, XLA's MLP is
            # slightly faster than the kernel (1.63 vs 1.72 ms/layer at
            # ViT-B/32 step shapes), but in the full tower XLA assigns its
            # MLP GEMMs a non-default {2,0,1} layout while Pallas custom
            # calls mandate default layouts, so every kernel<->XLA
            # boundary inserts a transposing copy of the (B, S, W) stream
            # (~23 such copies / ~1.1 ms/layer, see /tmp HLO dump in
            # BENCHMARKS.md roofline notes). All-kernel layers have no
            # boundary: measured 38.2 ms vs 51.1 ms per step end-to-end
            # (13.4k vs 10.0k frames/s, scripts/bench_encoder_ab.py).
            # WISE_FUSED_MLP=0 restores the XLA-MLP hybrid for A/B runs.
            ln1_s, ln1_b = _LNParams(self.width, name="ln_1")()
            (wqkv, bqkv), (wo, bo) = _MHAParams(self.width, name="attn")()
            dt = self.dtype
            x = attn_impl(
                x, ln1_s, ln1_b, wqkv.astype(dt), bqkv.astype(dt),
                wo.astype(dt), bo.astype(dt),
                self.heads, self.n_valid or s, self.causal_fused,
            )
            from ...ops.block import fused_mlp_split_train, mlp_choice

            # MLP kernel selection (ops.block.mlp_choice): single
            # whole-MLP kernel when both weights fit VMEM (width <= 768);
            # else the two-kernel split pair (one weight resident each,
            # one HBM round trip of the 4W intermediate) — either keeps
            # the layer all-custom-call so no relayout copies appear.
            choice = (
                mlp_choice(b, s, self.width)
                if os.environ.get("WISE_FUSED_MLP", "1") != "0" else None
            )
            if choice is not None:
                # variants: single/split (+ "...flat": merged-row GEMMs
                # inside the kernel — tile-exact row counts, ops/block.py)
                mlp_impl = (
                    fused_mlp_block_train
                    if choice[0] in ("single", "singleflat")
                    else fused_mlp_split_train
                )
                ln2_s, ln2_b = _LNParams(self.width, name="ln_2")()
                wfc, bfc = _DenseParams(self.width, 4 * self.width,
                                        name="mlp_fc")()
                wproj, bproj = _DenseParams(4 * self.width, self.width,
                                            name="mlp_proj")()
                act = self.quick_gelu
                act_str = (
                    "quick_gelu" if act is True
                    else (act if isinstance(act, str) and act else "gelu")
                )
                return mlp_impl(
                    x, ln2_s, ln2_b, wfc.astype(dt), bfc.astype(dt),
                    wproj.astype(dt), bproj.astype(dt), act_str,
                )
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
            h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
            h = _gelu(h, self.quick_gelu)
            return x + nn.Dense(self.width, dtype=self.dtype,
                                name="mlp_proj")(h)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype,
            softmax_f32=self.softmax_f32, fused=self.fused,
            n_valid=self.n_valid, causal_fused=self.causal_fused,
            name="attn"
        )(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
        h = _gelu(h, self.quick_gelu)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x

    def _pooled(self, x, mask, pool_rows=None):
        """Last-layer pooled-row path (see ``pool_row``): returns (B, D).
        ``pool_rows`` (B,) int32 is the dynamic-row variant — each example
        pools its own row (CLIP text EOT argmax, CLAP caption last real
        token) — dispatched to fused_attn_block_pooled_dyn. Reads the
        exact same parameter tree as the full paths (_LNParams/
        _MHAParams/_DenseParams declare nn.Dense/nn.LayerNorm's variables),
        so checkpoints are interchangeable between pooled and full blocks."""
        from ...ops.block import (
            fused_attn_block_pooled_dyn_train,
            fused_attn_block_pooled_train,
            supports_fused_block_pooled,
        )

        b, s = x.shape[0], x.shape[1]
        pr = self.pool_row
        dt = self.dtype
        nv = self.n_valid or s
        ln1_s, ln1_b = _LNParams(self.width, name="ln_1")()
        (wqkv, bqkv), (wo, bo) = _MHAParams(self.width, name="attn")()
        if (
            self.fused_block
            and (mask is None or self.causal_fused)
            and supports_fused_block_pooled(b, s, self.width, self.heads,
                                            jnp.dtype(dt))
        ):
            if pool_rows is not None:
                x0 = fused_attn_block_pooled_dyn_train(
                    x, pool_rows.astype(jnp.int32), ln1_s, ln1_b,
                    wqkv.astype(dt), bqkv.astype(dt),
                    wo.astype(dt), bo.astype(dt),
                    self.heads, nv, self.causal_fused,
                )
            else:
                x0 = fused_attn_block_pooled_train(
                    x, ln1_s, ln1_b, wqkv.astype(dt), bqkv.astype(dt),
                    wo.astype(dt), bo.astype(dt),
                    self.heads, nv, pr, self.causal_fused,
                )
        elif pool_rows is not None:
            # plain-ops dynamic-row pooled path: per-example
            # take_along_axis gathers, otherwise the same math as below
            D, H = self.width, self.heads
            hd = D // H
            rows = pool_rows.astype(jnp.int32)
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = jnp.maximum(
                (xf * xf).mean(-1, keepdims=True) - mean * mean, 0.0
            )
            y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln1_s
                 + ln1_b).astype(dt)
            kv = y @ wqkv[:, D:].astype(dt) + bqkv[D:].astype(dt)
            idx = rows[:, None, None]
            q = jnp.take_along_axis(y, idx, axis=1)[:, 0] @ (
                wqkv[:, :D].astype(dt)
            ) + bqkv[:D].astype(dt)
            qh = q.reshape(b, H, hd)
            kh = kv[..., :D].reshape(b, s, H, hd)
            vh = kv[..., D:].reshape(b, s, H, hd)
            logits = jnp.einsum("bhd,bkhd->bhk", qh, kh) * (
                1.0 / np.sqrt(hd)
            )
            if mask is not None:
                # each example sees exactly its own row of the mask
                m2 = jnp.broadcast_to(mask[0, 0], (s, s))
                logits = logits + m2[rows][:, None, :].astype(logits.dtype)
            if nv < s:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
                logits = logits + jnp.where(col < nv, 0.0, -jnp.inf)
            if self.softmax_f32:
                p = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(dt)
            else:
                p = jax.nn.softmax(logits, axis=-1)
            att = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, D)
            xp = jnp.take_along_axis(x, idx, axis=1)[:, 0]
            x0 = xp + (att @ wo.astype(dt) + bo.astype(dt))
        else:
            # plain-ops pooled path (f32 / CPU / unadmitted shapes):
            # q and out-proj restricted to the pooled row, k/v full —
            # element-for-element the math of the full XLA block at row pr
            D, H = self.width, self.heads
            hd = D // H
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = jnp.maximum(
                (xf * xf).mean(-1, keepdims=True) - mean * mean, 0.0
            )
            y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln1_s
                 + ln1_b).astype(dt)
            kv = y @ wqkv[:, D:].astype(dt) + bqkv[D:].astype(dt)
            q = y[:, pr, :] @ wqkv[:, :D].astype(dt) + bqkv[:D].astype(dt)
            qh = q.reshape(b, H, hd)
            kh = kv[..., :D].reshape(b, s, H, hd)
            vh = kv[..., D:].reshape(b, s, H, hd)
            logits = jnp.einsum("bhd,bkhd->bhk", qh, kh) * (
                1.0 / np.sqrt(hd)
            )
            if mask is not None:
                # the pooled row sees exactly its row of the mask
                logits = logits + mask[..., pr, :].astype(logits.dtype)
            if nv < s:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
                logits = logits + jnp.where(col < nv, 0.0, -jnp.inf)
            if self.softmax_f32:
                p = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(dt)
            else:
                p = jax.nn.softmax(logits, axis=-1)
            att = jnp.einsum("bhk,bkhd->bhd", p, vh).reshape(b, D)
            x0 = x[:, pr, :] + (att @ wo.astype(dt) + bo.astype(dt))
        # last-layer MLP on the pooled row only: (B, D) ops are a
        # ~0.03 ms GEMM at ViT-B/32 shapes (vs ~1.7 ms for all rows) and
        # 2-D tensors stay out of the Pallas<->XLA relayout story
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x0)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
        h = _gelu(h, self.quick_gelu)
        return x0 + nn.Dense(self.width, dtype=self.dtype,
                             name="mlp_proj")(h)


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    quick_gelu: bool
    dtype: Any = jnp.float32
    remat: bool = False
    softmax_f32: bool = True
    fused: bool = False
    fused_block: bool = False
    n_valid: Optional[int] = None
    causal_fused: bool = False
    #: statically-pooled towers set this: the LAST layer computes only the
    #: pooled row (ResidualAttentionBlock.pool_row) and the transformer
    #: returns (B, D) instead of (B, S, D)
    pool_row: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None, pool_rows=None):
        """``pool_rows`` (B,) int32: dynamic per-example pooled rows for
        the LAST layer (argmax/EOT CLIP text, CLAP caption last real
        token) — like ``pool_row`` but data-dependent; the transformer
        then returns (B, D)."""
        block_cls = (
            nn.remat(ResidualAttentionBlock, static_argnums=())
            if self.remat
            else ResidualAttentionBlock
        )
        for i in range(self.layers):
            last = i == self.layers - 1
            x = block_cls(
                self.width, self.heads, self.quick_gelu, dtype=self.dtype,
                softmax_f32=self.softmax_f32, fused=self.fused,
                fused_block=self.fused_block,
                n_valid=self.n_valid, causal_fused=self.causal_fused,
                pool_row=(self.pool_row if last else None),
                name=f"resblocks_{i}",
            )(x, mask, pool_rows if last else None)
        return x


class MAPHead(nn.Module):
    """Attention-pool latent head (SigLIP/big_vision style): a learned query
    attends over all tokens, followed by an MLP block."""

    width: int
    heads: int
    act: Any = "gelu_tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        D, H = self.width, self.heads
        head_dim = D // H
        b = tokens.shape[0]
        probe = self.param(
            "probe", nn.initializers.normal(0.02), (1, D)
        )
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(
            jnp.broadcast_to(probe.astype(self.dtype), (b, 1, D))
        )
        kv = nn.Dense(2 * D, dtype=self.dtype, name="kv_proj")(tokens)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            return t.reshape(t.shape[0], t.shape[1], H, head_dim)

        q, k, v = map(heads_split, (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, 1, D)
        out = nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(out)
        h = nn.Dense(4 * D, dtype=self.dtype, name="mlp_fc")(y)
        h = _gelu(h, self.act)
        out = out + nn.Dense(D, dtype=self.dtype, name="mlp_proj")(h)
        return out[:, 0, :]


class _ConvParams(nn.Module):
    """nn.Conv's patch-embed variables (kernel HWIO + optional bias) for
    the patchify-matmul path — one checkpoint layout for both."""

    patch: int
    width: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.patch, self.patch, 3, self.width),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.width,))
            if self.use_bias else None
        )
        return kern, bias


class VisionTransformer(nn.Module):
    config: CLIPConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) float, already normalised. Returns (B, embed_dim)."""
        c = self.config
        grid = c.image_size // c.patch_size
        use_cls = c.vision_pool == "cls"
        if c.patch_embed_matmul:
            # patchify + one big GEMM — identical math/params to the conv
            # (kernel reshaped HWIO -> (p*p*3, D) matches the flattened
            # per-patch (h, w, chan) element order)
            p = c.patch_size
            kern, bias = _ConvParams(
                p, c.vision_width, use_bias=not use_cls, name="conv1"
            )()
            b = images.shape[0]
            xp = images.astype(c.dtype).reshape(b, grid, p, grid, p, 3)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, grid * grid, p * p * 3
            )
            x = xp @ kern.reshape(p * p * 3, c.vision_width).astype(c.dtype)
            if bias is not None:
                x = x + bias.astype(c.dtype)
        else:
            x = nn.Conv(
                c.vision_width,
                kernel_size=(c.patch_size, c.patch_size),
                strides=(c.patch_size, c.patch_size),
                use_bias=not use_cls,  # SigLIP patch embed has a bias
                dtype=c.dtype,
                name="conv1",
            )(images.astype(c.dtype))
            x = x.reshape(x.shape[0], grid * grid, c.vision_width)
        n_tokens = grid * grid
        if use_cls:
            class_emb = self.param(
                "class_embedding", nn.initializers.normal(0.02),
                (c.vision_width,),
            )
            cls = jnp.broadcast_to(
                class_emb.astype(c.dtype), (x.shape[0], 1, c.vision_width)
            )
            x = jnp.concatenate([cls, x], axis=1)
            n_tokens += 1
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_tokens, c.vision_width),
        )
        x = x + pos.astype(c.dtype)
        if use_cls:
            # CLIP applies a pre-LN; SigLIP (MAP-pooled) has none
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        # fused-attention candidacy: pad the token axis to a sublane
        # multiple and key-mask the pad. Padded rows are sliced off right
        # after the transformer, so both cls pooling and the SigLIP MAP
        # head see only real tokens. The per-call shape gate lives in
        # MultiHeadAttention (e.g. batch-1 query embeds fall back to the
        # masked XLA path with identical results).
        from ...ops.block import (
            supports_fused_block,
            supports_fused_block_padded,
        )

        sp8 = ((n_tokens + 7) // 8) * 8
        fused = bool(
            (c.fused_attention or c.fused_block)
            and jnp.dtype(c.dtype) == jnp.bfloat16
            and (
                c.vision_width // c.vision_heads == 64
                # head_dim 80 (ViT-H class — the reference's default
                # backbone): pad the token axis only when a calibrated
                # block path will actually consume it (monolithic kernel
                # via _CALIBRATED_ATTN, or the padded-head fallback),
                # else stay on the unpadded XLA path
                or (c.fused_block and (
                    supports_fused_block(
                        x.shape[0], sp8, c.vision_width, c.vision_heads,
                        c.dtype)
                    or supports_fused_block_padded(
                        x.shape[0], sp8, c.vision_width, c.vision_heads,
                        c.dtype)))
            )
        )
        n_valid = None
        if fused:
            # Residual-stream dtype: ln_pre's f32 LayerNorm sets the dtype
            # of every kernel-boundary tensor (the block kernels propagate
            # x.dtype). The f32 carry measured FASTER than casting to bf16
            # here despite 2x the boundary HBM bytes — see
            # CLIPConfig.bf16_stream for the numbers and the why.
            if c.bf16_stream:
                x = x.astype(c.dtype)
            if sp8 != n_tokens:
                x = jnp.pad(x, ((0, 0), (0, sp8 - n_tokens), (0, 0)))
            n_valid = n_tokens
        pool_row = 0 if (use_cls and c.pool_last_block) else None
        x = Transformer(
            c.vision_width, c.vision_layers, c.vision_heads,
            c.act or c.quick_gelu,
            dtype=c.dtype, remat=c.remat,
            softmax_f32=c.attn_softmax_f32,
            fused=fused and c.fused_attention,
            fused_block=fused and c.fused_block,
            n_valid=n_valid, pool_row=pool_row, name="transformer",
        )(x)
        if pool_row is not None:
            # the transformer already returned the pooled (B, D) cls row
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="ln_post")(x)
        elif use_cls:
            if n_valid is not None:
                x = x[:, :n_tokens]
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
                x[:, 0, :]
            )
        else:
            if n_valid is not None:
                x = x[:, :n_tokens]
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
            x = MAPHead(
                c.vision_width, c.vision_heads,
                act=c.act or c.quick_gelu, dtype=c.dtype, name="attn_pool",
            )(x.astype(c.dtype))
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.vision_width, c.embed_dim)
        )
        return (x.astype(c.dtype) @ proj.astype(c.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    config: CLIPConfig

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, context_length) int32. Returns (B, embed_dim).
        Pooled at the argmax token (EOT has the highest id, matching
        open_clip)."""
        c = self.config
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.text_width),
        )
        x = emb[tokens].astype(c.dtype)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
        )
        x = x + pos.astype(c.dtype)
        # fused-attention candidacy (mirrors the vision tower): causal
        # argmax-pooled CLIP text towers only — "last"-pooled (SigLIP)
        # towers read position -1, which padding would corrupt
        fused = bool(
            (c.fused_attention or c.fused_block)
            and c.text_causal
            and c.text_pool == "argmax"
            and jnp.dtype(c.dtype) == jnp.bfloat16
            and c.text_width // c.text_heads == 64
        )
        n_tok = c.context_length
        sp = ((n_tok + 7) // 8) * 8 if fused else n_tok
        if sp != n_tok:
            x = jnp.pad(x, ((0, 0), (0, sp - n_tok), (0, 0)))
        if c.text_causal:
            # sized to the (possibly padded) sequence so the XLA fallback
            # inside MultiHeadAttention stays shape-correct
            mask = jnp.full((sp, sp), -jnp.inf, dtype=jnp.float32)
            mask = jnp.triu(mask, k=1)[None, None]
        else:
            mask = None  # SigLIP text attends bidirectionally
        # "last"-pooled (SigLIP) towers read the STATIC row n_tok-1, so the
        # final layer qualifies for the pooled-row path (pool_last_block);
        # argmax/EOT CLIP pooling is data-dependent per sample but the row
        # is a function of the token ids alone, so the last layer runs the
        # DYNAMIC pooled-row path (pool_rows) with per-example rows.
        pool_row = (
            n_tok - 1
            if (c.text_pool == "last" and c.pool_last_block) else None
        )
        pool_rows = (
            jnp.argmax(tokens, axis=-1).astype(jnp.int32)
            if (c.text_pool == "argmax" and c.pool_last_block) else None
        )
        x = Transformer(
            c.text_width, c.text_layers, c.text_heads,
            c.act or c.quick_gelu,
            dtype=c.dtype, remat=c.remat,
            softmax_f32=c.attn_softmax_f32,
            fused=fused and c.fused_attention,
            fused_block=fused and c.fused_block,
            n_valid=n_tok if fused else None, causal_fused=fused,
            pool_row=pool_row, name="transformer",
        )(x, mask, pool_rows=pool_rows)
        if pool_row is not None or pool_rows is not None:
            pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                  name="ln_final")(x)
        else:
            if sp != n_tok:
                x = x[:, :n_tok]
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="ln_final")(x)
            if c.text_pool == "last":
                pooled = x[:, -1, :]
            else:
                eot = jnp.argmax(tokens, axis=-1)
                pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (c.text_width, c.embed_dim),
        )
        out = pooled.astype(c.dtype) @ proj.astype(c.dtype)
        if c.text_proj_bias:  # SigLIP text head is a biased Linear
            bias = self.param(
                "text_projection_bias", nn.initializers.zeros, (c.embed_dim,)
            )
            out = out + bias.astype(c.dtype)
        return out.astype(jnp.float32)


class CLIP(nn.Module):
    config: CLIPConfig

    def setup(self):
        self.visual = VisionTransformer(self.config)
        if self.config.text_tower == "hf_xlm_roberta":
            from .hf_text import HFTextConfig, XLMRobertaTextTower

            c = self.config
            self.text = XLMRobertaTextTower(
                HFTextConfig(
                    vocab_size=c.vocab_size, width=c.text_width,
                    layers=c.text_layers, heads=c.text_heads,
                    intermediate=4 * c.text_width, embed_dim=c.embed_dim,
                    proj_type=c.hf_proj_type,
                    dtype=c.dtype,
                    # post-LN fused block kernels (ops/postln_block.py)
                    # ride the same production gate/kill-switch as the
                    # pre-LN towers (WISE_FUSED_BLOCK=0)
                    fused_block=c.fused_block,
                )
            )
        else:
            self.text = TextTransformer(self.config)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )

    def encode_image(self, images, normalize: bool = True):
        feats = self.visual(images)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_text(self, tokens, normalize: bool = True):
        feats = self.text(tokens)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        return img, txt, jnp.exp(self.logit_scale)
