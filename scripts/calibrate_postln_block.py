#!/usr/bin/env python
"""Calibrate the post-LN (XLM-R) block kernels on hardware.

Sweeps batch groups for fused_postln_attn_block and both variants of
fused_postln_mlp_block at the XLM-R-large text shape (SP=64, D=1024,
FF=4096, 16 heads) against the XLA layer, and prints per-group times.
Winners go into ops/postln_block._CALIBRATED_POSTLN_*.

    python scripts/calibrate_postln_block.py [--iters 100] [--batch 256]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--groups", default="1,2,4,8,16")
    p.add_argument("--batches", default="256,64")
    p.add_argument("--sp", type=int, default=64)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--ff", type=int, default=4096)
    p.add_argument("--heads", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.postln_block import (
        fused_postln_attn_block,
        fused_postln_mlp_block,
    )

    bf = jnp.bfloat16
    SP, D, FF, H = args.sp, args.d, args.ff, args.heads

    def timed(fn, *xs, iters=args.iters):
        out = fn(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
        t0 = time.perf_counter()
        x0 = xs[0]
        for _ in range(iters):
            out = fn(x0, *xs[1:])
            x0 = x0 + 0 * out[:, :1, :1].astype(x0.dtype)  # dep chain
        np.asarray(out[0, 0, 0])
        return (time.perf_counter() - t0) / iters

    for B in [int(s) for s in args.batches.split(",")]:
        ks = jax.random.split(jax.random.PRNGKey(0), 10)
        x = (jax.random.normal(ks[0], (B, SP, D)) * 0.5).astype(bf)
        nv = jax.random.randint(ks[9], (B,), 2, SP)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, 1, SP), 2)
        km = jnp.where(col < nv[:, None, None], 0.0, -jnp.inf).astype(
            jnp.float32
        )
        ln_s = 1.0 + 0.02 * jax.random.normal(ks[1], (D,))
        ln_b = 0.02 * jax.random.normal(ks[2], (D,))
        wqkv = (0.02 * jax.random.normal(ks[3], (D, 3 * D))).astype(bf)
        bqkv = (0.02 * jax.random.normal(ks[4], (3 * D,))).astype(bf)
        wo = (0.02 * jax.random.normal(ks[5], (D, D))).astype(bf)
        bo = (0.02 * jax.random.normal(ks[6], (D,))).astype(bf)
        wfc = (0.02 * jax.random.normal(ks[7], (D, FF))).astype(bf)
        bfc = jnp.zeros((FF,), bf)
        wproj = (0.02 * jax.random.normal(ks[8], (FF, D))).astype(bf)
        bproj = jnp.zeros((D,), bf)

        print(f"\n== postln attn: B={B} SP={SP} D={D} H={H}")

        def xla_attn(xx):
            hd = D // H
            q = (xx @ wqkv[:, :D] + bqkv[:D]).reshape(B, SP, H, hd)
            k = (xx @ wqkv[:, D:2 * D] + bqkv[D:2 * D]).reshape(
                B, SP, H, hd)
            v = (xx @ wqkv[:, 2 * D:] + bqkv[2 * D:]).reshape(B, SP, H, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            logits = logits + km[:, :, None, :]
            pr = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(bf)
            att = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(B, SP, D)
            res = (xx + att @ wo + bo).astype(jnp.float32)
            mean = res.mean(-1, keepdims=True)
            var = jnp.maximum((res * res).mean(-1, keepdims=True)
                              - mean * mean, 0.0)
            return ((res - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s
                    + ln_b).astype(bf)

        t = timed(jax.jit(xla_attn), x)
        print(f"  xla attn+LN      : {t*1e3:8.3f} ms")
        for g in [int(s) for s in args.groups.split(",")]:
            if B % g:
                continue
            try:
                t = timed(lambda xx, g=g: fused_postln_attn_block(
                    xx, km, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                    group=g), x)
                print(f"  postln attn g={g:<3d}: {t*1e3:8.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  postln attn g={g:<3d}: FAIL "
                      f"{str(e).splitlines()[0][:80]}")

        print(f"== postln mlp: B={B} SP={SP} D={D} FF={FF}")

        def xla_mlp(xx):
            h = jax.nn.gelu((xx @ wfc + bfc).astype(jnp.float32),
                            approximate=False).astype(bf)
            res = (xx + h @ wproj + bproj).astype(jnp.float32)
            mean = res.mean(-1, keepdims=True)
            var = jnp.maximum((res * res).mean(-1, keepdims=True)
                              - mean * mean, 0.0)
            return ((res - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s
                    + ln_b).astype(bf)

        t = timed(jax.jit(xla_mlp), x)
        print(f"  xla mlp+LN        : {t*1e3:8.3f} ms")
        for variant in ("single", "split"):
            for g in [int(s) for s in args.groups.split(",")]:
                if B % g:
                    continue
                try:
                    t = timed(lambda xx, g=g, v=variant:
                              fused_postln_mlp_block(
                                  xx, ln_s, ln_b, wfc, bfc, wproj, bproj,
                                  group=g, variant=v), x)
                    print(f"  {variant:6s} g={g:<3d}    : {t*1e3:8.3f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  {variant:6s} g={g:<3d}    : FAIL "
                          f"{str(e).splitlines()[0][:80]}")


if __name__ == "__main__":
    main()
