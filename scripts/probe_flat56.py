#!/usr/bin/env python
"""Per-op flat-vs-batched calibration at the ViT-B/32 shape (SP=56, D=768).

probe_sp50.py (round 4) showed the PAIRED flat variants beating the
production non-flat calibration by ~14% per layer pair at B=512 —
but it changed attn and MLP together. This isolates each op: attn
flat/non-flat x group, MLP single/singleflat x group, timed back-to-back
in one process on the real chip (100-iter data-dependent chains).

    python scripts/probe_flat56.py [--batch 512] [--iters 100]
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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
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

    def timeit(step):
        try:
            carry = step(x, jnp.float32(0))
            np.asarray(carry)
        except Exception as e:
            return f"compile failed: {str(e)[:100]}"
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(x, carry)
        np.asarray(carry)
        return round((time.perf_counter() - t0 - rt) / args.iters * 1e3, 3)

    for g in (1, 2, 4, 8):
        for flat in (False, True):
            @jax.jit
            def astep(x, carry, g=g, flat=flat):
                y = fused_attn_block(
                    x + (carry * 0).astype(x.dtype), ln, lnb, wqkv, bq,
                    wo, bo, heads=HEADS, n_valid=50, group=g, flat=flat,
                )
                return y[0, 0, 0].astype(jnp.float32)

            out[f"attn_g{g}{'_flat' if flat else ''}_ms"] = timeit(astep)

    for g in (1, 2, 4):
        for flat in (False, True):
            @jax.jit
            def mstep(x, carry, g=g, flat=flat):
                y = fused_mlp_block(
                    x + (carry * 0).astype(x.dtype), ln, lnb, wfc, bf,
                    wproj, bp, act="quick_gelu", group=g, flat=flat,
                )
                return y[0, 0, 0].astype(jnp.float32)

            out[f"mlp_g{g}{'_flat' if flat else ''}_ms"] = timeit(mstep)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
