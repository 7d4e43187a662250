#!/usr/bin/env python
"""End-to-end throughput of the reference's DEFAULT extractor backbone as
ONE config: mlfoundations/open_clip/xlm-roberta-large-ViT-H-14 (reference
extract-features.py:195-207) — ViT-H/14 vision (head_dim 80, padded-head/
calibrated block kernels) + XLM-RoBERTa-large text (post-LN block kernels),
through the SAME OpenClipExtractor serving path the pipeline uses (GEMM
preprocess, bucketed batches, production env gates). Round-3 VERDICT item
10: the towers were measured separately (454 f/s, 3,774 texts/s); this
measures the extractor config end-to-end on the real chip.

Random-init weights (no network in this env) — throughput only.

    python scripts/bench_default_backbone.py [--batch 128] [--text-batch 256]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--text-batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.extractor import OpenClipExtractor
    from wise_tpu.utils.profiling import measure_roundtrip

    fx = OpenClipExtractor(
        "mlfoundations/open_clip/xlm-roberta-large-ViT-H-14/"
        "frozen_laion5b_s13b_b90k"
    )
    s = fx.config.image_size
    rng = np.random.default_rng(0)

    # ---- vision: uint8 frames through the full preprocess+tower graph
    frames = jnp.asarray(
        rng.integers(0, 255, (args.batch, s, s, 3), dtype=np.uint8)
    )

    @jax.jit
    def vstep(params, frames, carry):
        eps = (carry * 0).astype(jnp.float32)
        out = fx._encode_image(params, frames) + eps
        return out[0, 0]

    carry = vstep(fx.params, frames, jnp.float32(0))
    np.asarray(carry)  # compile + warm
    rt = measure_roundtrip()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        carry = vstep(fx.params, frames, carry)
    np.asarray(carry)
    v_dt = time.perf_counter() - t0 - rt
    vision_fps = args.batch * args.iters / v_dt

    # ---- text: tokenized batch through the XLM-R tower
    toks = fx.tokenizer([f"a photo of object number {i}"
                         for i in range(args.text_batch)])
    toks = jnp.asarray(np.asarray(toks, np.int32))

    @jax.jit
    def tstep(params, toks, carry):
        out = fx._encode_text(params, toks + (carry * 0).astype(toks.dtype))
        return out[0, 0]

    tcarry = tstep(fx.params, toks, jnp.float32(0))
    np.asarray(tcarry)
    rt = measure_roundtrip()
    n_t = max(args.iters, 30)
    t0 = time.perf_counter()
    for _ in range(n_t):
        tcarry = tstep(fx.params, toks, tcarry)
    np.asarray(tcarry)
    t_dt = time.perf_counter() - t0 - rt
    text_qps = args.text_batch * n_t / t_dt

    print(json.dumps({
        "backbone": "xlm-roberta-large-ViT-H-14",
        "vision_frames_per_s": round(vision_fps, 1),
        "vision_ms_per_batch": round(v_dt / args.iters * 1e3, 2),
        "vision_batch": args.batch,
        "text_queries_per_s": round(text_qps, 1),
        "text_ms_per_batch": round(t_dt / n_t * 1e3, 2),
        "text_batch": args.text_batch,
        "tunnel_roundtrip_s": round(rt, 4),
    }))


if __name__ == "__main__":
    main()
