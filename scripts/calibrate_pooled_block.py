#!/usr/bin/env python
"""Calibrate fused_attn_block_pooled batch groups on the real chip.

For each production (seq_pad, width) tower shape, times the Pallas pooled
kernel at candidate groups (compile failures reported as OOM), the plain
XLA pooled fallback, and the FULL fused attention block (what the pooled
path replaces). Winners go into ops/block._CALIBRATED_POOLED.

    python scripts/calibrate_pooled_block.py [--iters 50]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# (label, B, SP, D, H, n_valid, pool_row, causal)
SHAPES = [
    ("vit_b32 vision", 512, 56, 768, 12, 50, 0, False),
    ("vit_b16 vision", 256, 200, 768, 12, 197, 0, False),
    ("vit_l14 vision", 128, 264, 1024, 16, 257, 0, False),
    ("vit_h14 vision", 128, 264, 1280, 16, 257, 0, False),
    ("clip text b", 512, 80, 512, 8, 77, 76, True),
    ("siglip text", 256, 64, 1024, 16, 64, 63, False),
]

# dynamic-row (per-example pooled row) shapes: CLIP text pools at the
# argmax/EOT token, the CLAP caption tower (GPT2-small width 768) at each
# caption's last real token. Same harness with rows drawn uniformly.
DYN_SHAPES = [
    ("clip text b dyn", 512, 80, 512, 8, 77, True),
    ("clip text b dyn q64", 64, 80, 512, 8, 77, True),
    ("clap caption dyn", 256, 80, 768, 12, 77, True),
    ("clap caption dyn q64", 64, 80, 768, 12, 77, True),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--groups", default="8,16,32,64")
    p.add_argument("--only", default="", help="substring filter on labels")
    p.add_argument("--dyn", action="store_true",
                   help="also calibrate the dynamic-row pooled kernel")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.block import (
        fused_attn_block,
        fused_attn_block_pooled,
        _pooled_block_xla,
    )
    from wise_tpu.utils.profiling import measure_roundtrip

    roundtrip = measure_roundtrip()
    print(f"roundtrip {roundtrip*1e3:.1f} ms")
    bf = jnp.bfloat16

    def timed(fn, x):
        def step(c, xx):
            out = fn(xx + c.astype(bf) * 0)
            return out.reshape(-1)[0].astype(jnp.float32)

        jstep = jax.jit(step)
        np.asarray(jstep(jnp.float32(0), x))  # compile + one warm call
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jstep(c, x)
        np.asarray(c)
        return (time.perf_counter() - t0 - roundtrip) / args.iters

    for label, B, SP, D, H, nv, pr, causal in SHAPES:
        if args.only and args.only not in label:
            continue
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        x = (jax.random.normal(ks[0], (B, SP, D)) * 0.5).astype(bf)
        ln_s = 1.0 + 0.02 * jax.random.normal(ks[1], (D,))
        ln_b = 0.02 * jax.random.normal(ks[2], (D,))
        wqkv = (0.02 * jax.random.normal(ks[3], (D, 3 * D))).astype(bf)
        bqkv = (0.02 * jax.random.normal(ks[4], (3 * D,))).astype(bf)
        wo = (0.02 * jax.random.normal(ks[5], (D, D))).astype(bf)
        bo = (0.02 * jax.random.normal(ks[6], (D,))).astype(bf)
        print(f"\n== {label}: B={B} SP={SP} D={D} H={H} "
              f"n_valid={nv} pool_row={pr} causal={causal}")

        try:
            t = timed(lambda xx: fused_attn_block(
                xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H, n_valid=nv,
                causal=causal), x)
            print(f"  full fused block : {t*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001 - shape not admitted
            print(f"  full fused block : n/a ({str(e).splitlines()[0][:70]})")

        t = timed(lambda xx: _pooled_block_xla(
            xx, ln_s, ln_b, wqkv, bqkv, wo, bo, H, nv, pr, causal), x)
        print(f"  xla pooled       : {t*1e3:8.3f} ms")

        for g in [int(s) for s in args.groups.split(",")]:
            if B % g:
                continue
            try:
                t = timed(lambda xx, g=g: fused_attn_block_pooled(
                    xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                    n_valid=nv, pool_row=pr, causal=causal, group=g), x)
                print(f"  pooled g={g:<3d}     : {t*1e3:8.3f} ms")
            except Exception as e:  # noqa: BLE001 - scoped-vmem OOM etc.
                msg = str(e).split("\n")[0][:90]
                print(f"  pooled g={g:<3d}     : FAIL {msg}")

    if not args.dyn:
        return

    from wise_tpu.ops.block import (
        _pooled_block_xla_dyn,
        fused_attn_block_pooled_dyn,
    )

    for label, B, SP, D, H, nv, causal in DYN_SHAPES:
        if args.only and args.only not in label:
            continue
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        x = (jax.random.normal(ks[0], (B, SP, D)) * 0.5).astype(bf)
        rows = jax.random.randint(ks[7], (B,), 0, nv).astype(jnp.int32)
        ln_s = 1.0 + 0.02 * jax.random.normal(ks[1], (D,))
        ln_b = 0.02 * jax.random.normal(ks[2], (D,))
        wqkv = (0.02 * jax.random.normal(ks[3], (D, 3 * D))).astype(bf)
        bqkv = (0.02 * jax.random.normal(ks[4], (3 * D,))).astype(bf)
        wo = (0.02 * jax.random.normal(ks[5], (D, D))).astype(bf)
        bo = (0.02 * jax.random.normal(ks[6], (D,))).astype(bf)
        print(f"\n== {label}: B={B} SP={SP} D={D} H={H} "
              f"n_valid={nv} causal={causal} (dynamic rows)")

        try:
            t = timed(lambda xx: fused_attn_block(
                xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H, n_valid=nv,
                causal=causal), x)
            print(f"  full fused block : {t*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001 - shape not admitted
            print(f"  full fused block : n/a ({str(e).splitlines()[0][:70]})")

        t = timed(lambda xx: _pooled_block_xla_dyn(
            xx, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, H, nv, causal), x)
        print(f"  xla pooled dyn   : {t*1e3:8.3f} ms")

        for g in [int(s) for s in args.groups.split(",")]:
            if B % g:
                continue
            try:
                t = timed(lambda xx, g=g: fused_attn_block_pooled_dyn(
                    xx, rows, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                    n_valid=nv, causal=causal, group=g), x)
                print(f"  pooled dyn g={g:<3d} : {t*1e3:8.3f} ms")
            except Exception as e:  # noqa: BLE001 - scoped-vmem OOM etc.
                msg = str(e).split("\n")[0][:90]
                print(f"  pooled dyn g={g:<3d} : FAIL {msg}")


if __name__ == "__main__":
    main()
