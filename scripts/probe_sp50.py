#!/usr/bin/env python
"""ViT-B/32 token-count-exact tiling probe (round-4 VERDICT item 5).

The production tower pads the 50-token sequence (49 patches + cls) to
SP=56 for the 8-sublane block constraint; at bf16 the (G*56) merged rows
still waste ~11% of MXU rows vs the 50 real tokens (BENCHMARKS.md
decomposition). This probes the whole-attn-block kernel at SP=50
directly — Mosaic masks non-tile-exact trailing dims — across groups
where G*50 is or isn't 16-row tile-exact (g=8 -> 400 rows = 25 exact
bf16 tiles), against the production (SP=56, g=2) configuration.

    python scripts/probe_sp50.py [--batch 512] [--iters 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.block import fused_attn_block, fused_mlp_block
    from wise_tpu.utils.profiling import measure_roundtrip

    D, HEADS, B = 768, 12, args.batch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[2], (D, D), jnp.bfloat16) * 0.02
    wfc = jax.random.normal(ks[3], (D, 4 * D), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(ks[4], (4 * D, D), jnp.bfloat16) * 0.02
    ln = jnp.ones((D,), jnp.float32)
    lnb = jnp.zeros((D,), jnp.float32)
    bq = jnp.zeros((3 * D,), jnp.bfloat16)
    bo = jnp.zeros((D,), jnp.bfloat16)
    bf = jnp.zeros((4 * D,), jnp.bfloat16)
    bp = jnp.zeros((D,), jnp.bfloat16)

    out = {"batch": B, "d": D}
    variants = [
        ("sp56_g2", 56, 2, False),
        ("sp56_g2_flat", 56, 2, True),
        ("sp50_g2_flat", 50, 2, True),
        ("sp50_g8_flat", 50, 8, True),   # G*50 = 400 rows = 25 bf16 tiles
        ("sp50_g8", 50, 8, False),
    ]
    for label, sp, group, flat in variants:
        x = jax.random.normal(ks[0], (B, sp, D), jnp.bfloat16)

        @jax.jit
        def step(x, carry):
            y = fused_attn_block(
                x + (carry * 0).astype(x.dtype), ln, lnb, wqkv, bq, wo, bo,
                heads=HEADS, n_valid=50, group=group, flat=flat,
            )
            y = fused_mlp_block(
                y, ln, lnb, wfc, bf, wproj, bp, act="quick_gelu",
                group=max(1, group // 2), flat=flat,
            )
            return y[0, 0, 0].astype(jnp.float32)

        try:
            carry = step(x, jnp.float32(0))
            np.asarray(carry)  # compile + warm
        except Exception as e:  # Mosaic rejects -> record and move on
            out[label] = f"compile failed: {str(e)[:120]}"
            continue
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(x, carry)
        np.asarray(carry)
        dt = (time.perf_counter() - t0 - rt) / args.iters
        out[label + "_ms"] = round(dt * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
