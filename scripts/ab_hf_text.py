#!/usr/bin/env python
"""End-to-end A/B of the fused post-LN kernels on the XLM-RoBERTa text
tower (the reference's default backbone's text side), production bf16
config, real TPU. Compares fused_block on/off at serving batch shapes.

    python scripts/ab_hf_text.py [--batch 256] [--iters 30]
"""

import argparse
import dataclasses as dc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.extractor import production_clip_config
    from wise_tpu.models.clip.model import CLIP

    B = args.batch
    cfg = production_clip_config("xlm-roberta-large-ViT-H-14")
    rng = np.random.default_rng(0)
    toks = np.full((B, cfg.context_length), 1, np.int32)  # pad id 1
    for i in range(B):
        n = rng.integers(4, cfg.context_length + 1)
        toks[i, :n] = rng.integers(2, 250000, n)
    toks = jnp.asarray(toks)
    imgs = jnp.zeros((1, 224, 224, 3))

    results = {}
    for fused in (False, True):
        c = dc.replace(cfg, fused_block=fused)
        model = CLIP(c)
        params = model.init(jax.random.PRNGKey(0), imgs, toks[:1])
        fn = jax.jit(
            lambda p, t: model.apply(p, t, method=CLIP.encode_text)
        )
        t0 = time.perf_counter()
        out = fn(params, toks)
        np.asarray(out)
        print(f"fused={fused}: compile+first {time.perf_counter()-t0:.1f}s")

        def chain(n=args.iters):
            t = toks
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(params, t)
                t = t.at[0, 0].set((o[0, 0] > 0).astype(jnp.int32) + 2)
            np.asarray(o[0, 0])
            return (time.perf_counter() - t0) / n

        best = min(chain(), chain(), chain())
        results[fused] = (best, np.asarray(out, np.float32))
        print(f"fused_block={fused}: {best*1e3:.3f} ms/step "
              f"({B/best:.0f} texts/s)")

    a, b = results[False][1], results[True][1]
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    print("cos min/mean:", cos.min(), cos.mean())
    print(f"speedup: {results[False][0]/results[True][0]:.3f}x")


if __name__ == "__main__":
    main()
