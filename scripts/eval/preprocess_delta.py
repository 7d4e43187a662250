#!/usr/bin/env python
"""Measure the embedding/rank-order delta between the fused device
preprocessing (crop-first + jax.image bicubic, wise_tpu/models/clip/
preprocess.py:preprocess_images) and the bit-faithful reference path
(PIL resize-first, preprocess_images_exact) — VERDICT round-1 item 1(c).

Runs hermetically with deterministic random-init ViT-B/32 weights (f32): a
random ViT amplifies input perturbations at least as much as a trained one,
so the numbers are a conservative bound. On a checkpoint-staged host, set
WISE_CHECKPOINT_DIR to measure with real weights.

    python scripts/eval/preprocess_delta.py [--frames 64] [--topk 10]

Prints one JSON line: cosine stats between the two embeddings of each frame
and top-k retrieval overlap when the exact-path embeddings query a fast-path
database.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--size", type=int, nargs=2, default=(288, 352))
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import CLIP, get_clip_config
    from wise_tpu.models.clip.preprocess import (
        preprocess_images,
        preprocess_images_exact,
    )

    config = dataclasses.replace(
        get_clip_config("ViT-B-32"), dtype=jnp.float32
    )
    model = CLIP(config)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.image_size, config.image_size, 3)),
        jnp.zeros((1, config.context_length), jnp.int32),
    )

    rng = np.random.default_rng(7)
    h, w = args.size
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(args.frames):
        base = (
            127 + 60 * np.sin(xx / (9.0 + i % 11) + i)
            + 50 * np.cos(yy / (13.0 + 2 * (i % 7)))
        )
        frames.append(
            np.clip(base[:, :, None] + rng.normal(0, 22, (h, w, 3)), 0, 255)
            .astype(np.uint8)
        )
    frames = np.stack(frames)

    @jax.jit
    def embed(params, x):
        # params as arguments, not closure constants — the dev tunnel's
        # remote compiler rejects oversized program bodies (HTTP 413)
        return model.apply(params, x, method=CLIP.encode_image)

    fast = np.asarray(
        embed(params,
              preprocess_images(jnp.asarray(frames), config.image_size))
    )
    exact = np.asarray(
        embed(params,
              jnp.asarray(preprocess_images_exact(frames, config.image_size)))
    )
    cos = np.sum(fast * exact, axis=1)

    # retrieval agreement: exact-path queries against a fast-path database
    k = args.topk
    sim_ff = fast @ fast.T
    sim_ef = exact @ fast.T
    top_f = np.argsort(-sim_ff, axis=1, kind="stable")[:, :k]
    top_e = np.argsort(-sim_ef, axis=1, kind="stable")[:, :k]
    overlap = np.mean([
        len(set(a) & set(b)) / k for a, b in zip(top_f, top_e)
    ])
    rank1 = float(np.mean(top_f[:, 0] == top_e[:, 0]))
    print(json.dumps({
        "frames": int(args.frames),
        "cos_mean": round(float(cos.mean()), 6),
        "cos_min": round(float(cos.min()), 6),
        f"top{k}_overlap": round(float(overlap), 4),
        "rank1_agreement": round(rank1, 4),
        "weights": "random-init ViT-B/32 f32 (conservative bound)",
    }))


if __name__ == "__main__":
    main()
