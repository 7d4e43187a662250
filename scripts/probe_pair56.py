#!/usr/bin/env python
"""Attn+MLP PAIR calibration at the ViT-B/32 shape (SP=56, D=768, B=512).

probe_flat56.py's per-op times don't add up to probe_sp50.py's paired
times (flat attn + flat MLP paired ran 0.3 ms/layer FASTER than the sum
of the isolated ops) — evidence of a layout interaction at the kernel
boundary. The model alternates attn/MLP, so the PAIR chain is the
representative unit. This times candidate (attn_cfg x mlp_cfg) pairs
back-to-back in one process.

    python scripts/probe_pair56.py [--batch 512] [--iters 100]
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
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.block import fused_attn_block, fused_mlp_block
    from wise_tpu.utils.profiling import measure_roundtrip

    D, HEADS, B, SP = 768, 12, args.batch, 56
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, SP, D), jnp.bfloat16)
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

    out = {"batch": B, "sp": SP, "d": D}
    pairs = [
        ("prod_a2_m1", (2, False), (1, False)),
        ("a2_m4", (2, False), (4, False)),
        ("a2f_m1f", (2, True), (1, True)),
        ("a2f_m2f", (2, True), (2, True)),
        ("a2f_m4f", (2, True), (4, True)),
        ("a8f_m4f", (8, True), (4, True)),
        ("a2f_m4", (2, True), (4, False)),
        ("a2_m2f", (2, False), (2, True)),
    ]
    for label, (ag, af), (mg, mf) in pairs:
        @jax.jit
        def step(x, carry, ag=ag, af=af, mg=mg, mf=mf):
            y = fused_attn_block(
                x + (carry * 0).astype(x.dtype), ln, lnb, wqkv, bq, wo, bo,
                heads=HEADS, n_valid=50, group=ag, flat=af,
            )
            y = fused_mlp_block(
                y, ln, lnb, wfc, bf, wproj, bp, act="quick_gelu",
                group=mg, flat=mf,
            )
            return y[0, 0, 0].astype(jnp.float32)

        try:
            carry = step(x, jnp.float32(0))
            np.asarray(carry)
        except Exception as e:
            out[label] = f"compile failed: {str(e)[:100]}"
            continue
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(x, carry)
        np.asarray(carry)
        out[label + "_ms"] = round(
            (time.perf_counter() - t0 - rt) / args.iters * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
