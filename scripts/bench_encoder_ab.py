#!/usr/bin/env python
"""One-process A/B of the production encoder step across kernel configs.

Measures ONLY the full step (uint8 preprocess + vision tower) for each
config, back-to-back in one process per the CLAUDE.md tunnel-timing rule,
so the comparison is apples-to-apples within a single session. This is
the decision source for the fused_block / patch_embed_matmul production
defaults in models/clip/extractor.py.

    python scripts/bench_encoder_ab.py [--batch 512] [--iters 15]
        [--model ViT-B-32] [--configs xla,attn,block,block+patch]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

CONFIGS = {
    "xla": dict(),
    "attn": dict(fused_attention=True),
    "block": dict(fused_block=True),
    "blockflat": dict(fused_block=True),  # + flat attn-block GEMMs (below)
    "block+patch": dict(fused_block=True, patch_embed_matmul=True),
    "attn+patch": dict(fused_attention=True, patch_embed_matmul=True),
    # pooled last layer (CLIPConfig.pool_last_block): the final layer
    # computes only the cls row — candidate production default
    "block+pool": dict(fused_block=True, pool_last_block=True),
    "block+pool+patch": dict(fused_block=True, pool_last_block=True,
                             patch_embed_matmul=True),
    # round-3 continuation: f32 vs bf16 residual-stream carry through the
    # kernel boundaries, same kernels otherwise. Measured: f32 36.08 ms vs
    # bf16 37.77 at ViT-B/32 B=512 — f32 stays the default
    # (CLIPConfig.bf16_stream docstring has the analysis)
    "block+pool+f32s": dict(fused_block=True, pool_last_block=True,
                            bf16_stream=False),
    "block+pool+bf16s": dict(fused_block=True, pool_last_block=True,
                             bf16_stream=True),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--configs", default="attn,block,block+patch")
    p.add_argument("--repeats", type=int, default=2,
                   help="interleaved measurement passes (best taken)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import CLIP, get_clip_config
    from wise_tpu.models.clip.preprocess import preprocess_images
    from wise_tpu.utils.profiling import measure_roundtrip

    B = args.batch
    names = [c for c in args.configs.split(",") if c]
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 256, 320, 3), np.uint8)
    )
    roundtrip = measure_roundtrip()
    out = {"batch": B, "model": args.model,
           "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}

    from wise_tpu.ops import block as blockmod

    steps = {}
    ref_out = None
    for name in names:
        cfg = dataclasses.replace(
            get_clip_config(args.model), dtype=jnp.bfloat16,
            **CONFIGS[name],
        )
        # "blockflat": mark every calibrated attn shape as flat-preferred
        # for the duration of this config's trace/compile (the flat gate
        # reads _CALIBRATED_FLAT_ATTN at trace time)
        saved_flat = dict(blockmod._CALIBRATED_FLAT_ATTN)
        if name == "blockflat":
            blockmod._CALIBRATED_FLAT_ATTN.update(blockmod._CALIBRATED_ATTN)
        model = CLIP(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )

        def step(c, params, frames, model=model, cfg=cfg):
            x = preprocess_images(
                frames + (c * 0).astype(frames.dtype), cfg.image_size
            )
            return model.apply(params, x, method=CLIP.encode_image)[0, 0]

        jstep = jax.jit(step)
        t0 = time.perf_counter()
        np.asarray(jstep(jnp.float32(0), params, frames))  # compile
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        steps[name] = (jstep, params)

        # numerics cross-check: full embedding cosine vs first config
        emb = np.asarray(jax.jit(
            lambda p, f, model=model, cfg=cfg: model.apply(
                p, preprocess_images(f[:8], cfg.image_size),
                method=CLIP.encode_image)
        )(params, frames))
        if name == "blockflat":
            blockmod._CALIBRATED_FLAT_ATTN.clear()
            blockmod._CALIBRATED_FLAT_ATTN.update(saved_flat)
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        if ref_out is None:
            ref_out = emb
        else:
            out[f"{name}_cos_vs_{names[0]}"] = round(
                float(np.mean(np.sum(emb * ref_out, axis=-1))), 6
            )

    # interleaved timing passes: config order ABC ABC, best-of per config
    times = {n: [] for n in names}
    for _ in range(args.repeats):
        for name in names:
            jstep, params = steps[name]
            c = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = jstep(c, params, frames)
            np.asarray(c)
            times[name].append(
                (time.perf_counter() - t0 - roundtrip) / args.iters
            )
    for name in names:
        t = min(times[name])
        out[f"{name}_ms"] = round(t * 1e3, 2)
        out[f"{name}_frames_per_s"] = round(B / t, 0)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
