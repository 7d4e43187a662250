#!/usr/bin/env python
"""Attribute the ViT-B/32 encoder's roofline gap (VERDICT round-1 weak #8).

The chip's true bf16 matmul peak is ~200 TFLOP/s (199.9 measured on the
ViT-layer GEMMs in isolation; the round-1 "108" figure was an
f32-accumulation artifact) — the pure-XLA headline of ~8k frames/s is
~34% MFU and the fused-attention path ~42% (BENCHMARKS.md roofline
section). This script decomposes the step into stages on the real chip
and prints where the missing time goes:

  full        uint8 preprocess + vision tower (the production step)
  forward     vision tower only, input already preprocessed
  preprocess  fused uint8 resize/normalize only
  embed       vision tower with 0 transformer layers (patch conv + pos +
              final LN + head + pooling)
  layers6     6-layer tower (per-layer cost = (layers12-layers6)/6)
  attn        standalone MultiHeadAttention at block shapes (512, 50, 768)
  matmuls     MXU floor for one layer's GEMM set at the exact step shapes

Timing follows CLAUDE.md: N data-dependent iterations chained on device,
one tiny readback, tunnel round trip subtracted. Optionally set
WISE_TRACE_DIR to also capture a jax.profiler trace of the full step.

    python scripts/profile_encoder.py [--batch 512] [--iters 10]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--fused", action="store_true",
                   help="profile the fused-attention production config")
    p.add_argument("--fused-block", action="store_true",
                   help="whole-residual-block Pallas kernels (ops/block.py)")
    p.add_argument("--patch-matmul", action="store_true",
                   help="patchify+GEMM patch embed instead of lax.conv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import (
        CLIP,
        MultiHeadAttention,
        get_clip_config,
    )
    from wise_tpu.models.clip.preprocess import preprocess_images

    B = args.batch
    base = dataclasses.replace(
        get_clip_config(args.model), dtype=jnp.bfloat16,
        fused_attention=args.fused,
        fused_block=args.fused_block,
        patch_embed_matmul=args.patch_matmul,
    )
    rng = jax.random.PRNGKey(0)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 256, 320, 3), np.uint8)
    )

    def rt():
        f = jax.jit(lambda a: a + 1)
        np.asarray(f(jnp.zeros((1,))))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(jnp.zeros((1,))))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    roundtrip = rt()
    out = {"batch": B, "model": args.model,
           "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}

    def timed(step, *arrays):
        """step(carry, *arrays) -> scalar carry; returns s/iter.

        Chains iterations in a HOST loop over one jitted step (data
        dependence through the carry), per the CLAUDE.md timing rule —
        unrolling the model inside one jit compiles an N-times-larger
        graph, which the dev tunnel's remote compiler can take 10+
        minutes on."""
        jstep = jax.jit(step)
        np.asarray(jstep(jnp.float32(0), *arrays))
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jstep(c, *arrays)
        np.asarray(c)
        return (time.perf_counter() - t0 - roundtrip) / args.iters

    def make_model(cfg):
        model = CLIP(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        return model, params

    model, params = make_model(base)

    # --- full production step
    def full(c, params, frames):
        x = preprocess_images(
            frames + (c * 0).astype(frames.dtype), base.image_size
        )
        return model.apply(params, x, method=CLIP.encode_image)[0, 0]

    t_full = timed(full, params, frames)
    out["full_ms"] = round(t_full * 1e3, 2)
    out["frames_per_s"] = round(B / t_full, 0)

    if os.environ.get("WISE_TRACE_DIR"):
        from wise_tpu.utils.profiling import trace

        with trace("vitb32_step"):
            np.asarray(full(jnp.float32(0), params, frames))

    # --- preprocess only
    def pre(c, frames):
        x = preprocess_images(
            frames + (c * 0).astype(frames.dtype), base.image_size
        )
        return x.astype(jnp.float32)[0, 0, 0, 0]

    t_pre = timed(pre, frames)
    out["preprocess_ms"] = round(t_pre * 1e3, 2)

    # --- forward only (input pre-preprocessed)
    pre_done = jax.jit(
        lambda f: preprocess_images(f, base.image_size)
    )(frames)

    def fwd(c, params, x):
        return model.apply(
            params, x + (c * 0).astype(x.dtype), method=CLIP.encode_image
        )[0, 0]

    t_fwd = timed(fwd, params, pre_done)
    out["forward_ms"] = round(t_fwd * 1e3, 2)

    # --- layer scaling: 0-layer (embed+head) and 6-layer towers
    for n_layers, tag in ((0, "embed_head_ms"), (6, "layers6_ms")):
        cfg_n = dataclasses.replace(base, vision_layers=n_layers)
        model_n, params_n = make_model(cfg_n)

        def fwd_n(c, params_n, x, model_n=model_n):
            return model_n.apply(
                params_n, x + (c * 0).astype(x.dtype),
                method=CLIP.encode_image,
            )[0, 0]

        t = timed(fwd_n, params_n, pre_done)
        out[tag] = round(t * 1e3, 2)
    # per-layer cost from the 12-vs-6 delta (robust to fixed overheads)
    per_layer = (t_fwd * 1e3 - out["layers6_ms"]) / 6
    out["per_layer_ms"] = round(per_layer, 3)
    out["embed_head_resid_ms"] = round(out["layers6_ms"] - 6 * per_layer, 2)

    # --- standalone attention at block shapes
    S = (base.image_size // base.patch_size) ** 2 + 1  # 50 tokens
    attn = MultiHeadAttention(base.vision_width, base.vision_heads,
                              dtype=jnp.bfloat16)
    x_blk = jax.random.normal(rng, (B, S, base.vision_width), jnp.bfloat16)
    attn_params = attn.init(jax.random.PRNGKey(0), x_blk)

    def attn_step(c, attn_params, x_blk):
        return attn.apply(
            attn_params, x_blk + (c * 0).astype(x_blk.dtype)
        ).astype(jnp.float32)[0, 0, 0]

    out["attention_ms"] = round(timed(attn_step, attn_params, x_blk) * 1e3, 3)

    # --- MXU floor for one layer's GEMMs at step shapes:
    #     qkv (M,768)x(768,2304), proj (M,768)x(768,768),
    #     mlp up (M,768)x(768,3072), mlp down (M,3072)x(3072,768)
    M = B * S
    w = base.vision_width
    shapes = [(M, w, 3 * w), (M, w, w), (M, w, 4 * w), (M, 4 * w, w)]
    gemm_flops = sum(2 * m * kk * n for m, kk, n in shapes)
    a_s = [jax.random.normal(rng, (m, kk), jnp.bfloat16)
           for m, kk, _ in shapes]
    b_s = [jax.random.normal(rng, (kk, n), jnp.bfloat16)
           for _, kk, n in shapes]

    def gemms(c, *ab):
        n = len(ab) // 2
        acc = c
        for a, b in zip(ab[:n], ab[n:]):
            y = jnp.dot(a + (c * 0).astype(a.dtype), b,
                        preferred_element_type=jnp.float32)
            acc = acc + jnp.max(y)
        return acc

    t_gemm = timed(gemms, *a_s, *b_s)
    out["layer_gemm_floor_ms"] = round(t_gemm * 1e3, 3)
    out["layer_gemm_tflops"] = round(gemm_flops / t_gemm / 1e12, 1)

    # --- attribution summary
    step_flops = 12 * gemm_flops + 2 * M * S * w * 2  # + attention scores/AV
    out["step_model_tflops_effective"] = round(step_flops / t_full / 1e12, 1)
    out["attribution"] = {
        "preprocess_pct": round(100 * t_pre / t_full, 1),
        "transformer_layers_pct": round(
            100 * (12 * per_layer / 1e3) / t_full, 1
        ),
        "embed_head_pct": round(
            100 * (out["embed_head_resid_ms"] / 1e3) / t_full, 1
        ),
        "gemm_floor_pct_of_layer": round(
            100 * out["layer_gemm_floor_ms"] / per_layer, 1
        ) if per_layer > 0 else None,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
