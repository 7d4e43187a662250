#!/usr/bin/env python
"""Probe the fused block kernels (ops/block.py) on the real chip.

For each kernel (attn block / MLP block) at the given step shapes, tries
the candidate batch groups, reports compile feasibility (scoped-VMEM OOM
shows up as a compile error), ms/call, and cosine agreement vs the XLA
block path. This is the calibration source for the VMEM budgets baked
into ops/block.py's group pickers.

    python scripts/bench_block_kernels.py [--batch 512] [--seq 56]
        [--width 768] [--heads 12] [--iters 50]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seq", type=int, default=56)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--n-valid", type=int, default=50)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--groups", default="8,4,2,1")
    p.add_argument("--causal", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.block import (
        fused_attn_block,
        fused_attn_block_padded,
        fused_mlp_block,
        fused_mlp_split,
    )

    B, SP, D, H = args.batch, args.seq, args.width, args.heads
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 12)
    bf = jnp.bfloat16
    x = (jax.random.normal(ks[0], (B, SP, D)) * 0.5).astype(bf)
    ln_s = 1.0 + 0.02 * jax.random.normal(ks[1], (D,))
    ln_b = 0.02 * jax.random.normal(ks[2], (D,))
    wqkv = (0.02 * jax.random.normal(ks[3], (D, 3 * D))).astype(bf)
    bqkv = (0.02 * jax.random.normal(ks[4], (3 * D,))).astype(bf)
    wo = (0.02 * jax.random.normal(ks[5], (D, D))).astype(bf)
    bo = (0.02 * jax.random.normal(ks[6], (D,))).astype(bf)
    wfc = (0.02 * jax.random.normal(ks[7], (D, 4 * D))).astype(bf)
    bfc = (0.02 * jax.random.normal(ks[8], (4 * D,))).astype(bf)
    wproj = (0.02 * jax.random.normal(ks[9], (4 * D, D))).astype(bf)
    bproj = (0.02 * jax.random.normal(ks[10], (D,))).astype(bf)

    from wise_tpu.utils.profiling import measure_roundtrip

    roundtrip = measure_roundtrip()
    print(f"roundtrip {roundtrip*1e3:.1f} ms; shapes B={B} SP={SP} D={D}")

    def timed(fn):
        # data-dependent host chain: feed a scalar carry into x
        def step(c, xx):
            return fn(xx + c.astype(bf) * 0)[0, 0, 0].astype(jnp.float32)

        jstep = jax.jit(step)
        np.asarray(jstep(jnp.float32(0), x))
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jstep(c, x)
        np.asarray(c)
        return (time.perf_counter() - t0 - roundtrip) / args.iters

    def cos_vs(a, b):
        a = np.asarray(a, np.float32).reshape(-1, D)
        b = np.asarray(b, np.float32).reshape(-1, D)
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-30
        return float((num / den).min())

    # XLA references (jitted whole-block functions)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_block_kernels import xla_attn_block, xla_mlp_block

    ref_attn = jax.jit(lambda xx: xla_attn_block(
        xx, ln_s, ln_b, wqkv.astype(jnp.float32), bqkv.astype(jnp.float32),
        wo.astype(jnp.float32), bo.astype(jnp.float32), H, args.n_valid,
        args.causal))
    ref_mlp = jax.jit(lambda xx: xla_mlp_block(
        xx, ln_s, ln_b, wfc.astype(jnp.float32), bfc.astype(jnp.float32),
        wproj.astype(jnp.float32), bproj.astype(jnp.float32), "gelu"))

    t = timed(ref_attn)
    print(f"xla attn block: {t*1e3:8.3f} ms")
    want_attn = ref_attn(x)
    t = timed(ref_mlp)
    print(f"xla mlp  block: {t*1e3:8.3f} ms")
    want_mlp = ref_mlp(x)

    for g in [int(s) for s in args.groups.split(",")]:
        if B % g:
            continue
        for name, fn, want in (
            ("attn", lambda xx, g=g: fused_attn_block(
                xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                n_valid=args.n_valid, causal=args.causal, group=g,
                flat=False), want_attn),
            ("attnflat", lambda xx, g=g: fused_attn_block(
                xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                n_valid=args.n_valid, causal=args.causal, group=g,
                flat=True), want_attn),
            ("mlp", lambda xx, g=g: fused_mlp_block(
                xx, ln_s, ln_b, wfc, bfc, wproj, bproj, act="gelu",
                group=g, flat=False), want_mlp),
            ("mlpflat", lambda xx, g=g: fused_mlp_block(
                xx, ln_s, ln_b, wfc, bfc, wproj, bproj, act="gelu",
                group=g, flat=True), want_mlp),
            ("mlpsplit", lambda xx, g=g: fused_mlp_split(
                xx, ln_s, ln_b, wfc, bfc, wproj, bproj, act="gelu",
                group=g, flat=False), want_mlp),
            ("mlpsplitflat", lambda xx, g=g: fused_mlp_split(
                xx, ln_s, ln_b, wfc, bfc, wproj, bproj, act="gelu",
                group=g, flat=True), want_mlp),
            # padded-head decomposition (non-lane-aligned head dims —
            # ViT-H class); groups=(proj, resid), probed square here
            ("attnpad", lambda xx, g=g: fused_attn_block_padded(
                xx, ln_s, ln_b, wqkv, bqkv, wo, bo, heads=H,
                n_valid=args.n_valid, causal=args.causal,
                groups=(g, g)), want_attn),
        ):
            try:
                got = fn(x)
                c = cos_vs(got[:, :args.n_valid], want[:, :args.n_valid])
                t = timed(fn)
                print(f"fused {name} g={g}: {t*1e3:8.3f} ms  cos={c:.6f}")
            except Exception as e:
                msg = str(e).split("\n")[0][:110]
                print(f"fused {name} g={g}: FAIL {msg}")


if __name__ == "__main__":
    main()
