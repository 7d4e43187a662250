#!/usr/bin/env python
"""Embed-fold probe (ViT-B/32 geometry): the fused patch-embed+attn-block
kernel (ops/embed_block.py) vs the split entry (XLA patchify GEMM + pos +
ln_pre + boundary + attn-block kernel), 100-iter chains in one process.

Isolated-pair probes have misled before (BENCHMARKS.md round-4 negatives)
— this is a COMPILE CHECK plus a coarse filter; the adoption decision is
the end-to-end step A/B.

    python scripts/probe_embed_fold.py [--batch 512] [--iters 100]
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

    from wise_tpu.ops.block import fused_attn_block
    from wise_tpu.ops.embed_block import fused_embed_attn_block
    from wise_tpu.utils.profiling import measure_roundtrip

    B, SP, D, HEADS, PD, NV = args.batch, 56, 768, 12, 32 * 32 * 3, 50
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    xp = jax.random.normal(ks[0], (B, SP, PD), jnp.bfloat16)
    xp = xp.at[:, 0].set(0).at[:, NV:].set(0)
    kern = jax.random.normal(ks[1], (PD, D), jnp.bfloat16) * 0.02
    posc = jax.random.normal(ks[2], (SP, D), jnp.float32) * 0.02
    posc = posc.at[NV:].set(0)
    lnp_s = jnp.ones((D,), jnp.float32)
    lnp_b = jnp.zeros((D,), jnp.float32)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)
    wqkv = jax.random.normal(ks[3], (D, 3 * D), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    wo = jax.random.normal(ks[4], (D, D), jnp.bfloat16) * 0.02
    bo = jnp.zeros((D,), jnp.bfloat16)

    out = {"batch": B}

    def timeit(label, step):
        try:
            c = step(xp, jnp.float32(0))
            np.asarray(c)
        except Exception as e:
            out[label] = f"compile failed: {str(e)[:140]}"
            return
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = step(xp, c)
        np.asarray(c)
        out[label + "_ms"] = round(
            (time.perf_counter() - t0 - rt) / args.iters * 1e3, 3)

    # split entry: XLA embed sequence then the production attn-block kernel
    @jax.jit
    def split(xp, carry):
        t = jnp.einsum("bsp,pd->bsd", xp + (carry * 0).astype(xp.dtype),
                       kern).astype(jnp.bfloat16)
        t = t + posc.astype(jnp.bfloat16)
        from wise_tpu.ops.block import _ln_f32
        t = _ln_f32(t.astype(jnp.float32), lnp_s, lnp_b)  # f32 stream
        y = fused_attn_block(t, ln_s, ln_b, wqkv, bqkv, wo, bo,
                             heads=HEADS, n_valid=NV)
        return y[0, 0, 0].astype(jnp.float32)

    timeit("split", split)

    for g in (1, 2, 4):
        @jax.jit
        def fold(xp, carry, g=g):
            y = fused_embed_attn_block(
                xp + (carry * 0).astype(xp.dtype), kern, posc,
                lnp_s, lnp_b, ln_s, ln_b, wqkv, bqkv, wo, bo,
                heads=HEADS, n_valid=NV, group=g,
            )
            return y[0, 0, 0].astype(jnp.float32)

        timeit(f"fold_g{g}", fold)

    # numerics: fold vs split full tensors at batch 8
    from wise_tpu.ops.embed_block import plain_embed_attn
    want = np.asarray(jax.jit(lambda xp: plain_embed_attn(
        xp[:8], kern, posc, lnp_s, lnp_b, ln_s, ln_b, wqkv, bqkv, wo, bo,
        heads=HEADS, n_valid=NV))(xp))
    got = np.asarray(jax.jit(lambda xp: fused_embed_attn_block(
        xp[:8], kern, posc, lnp_s, lnp_b, ln_s, ln_b, wqkv, bqkv, wo, bo,
        heads=HEADS, n_valid=NV, group=1))(xp))
    err = float(np.max(np.abs(got[:, :NV] - want[:, :NV])))
    out["max_abs_err_vs_plain"] = round(err, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
