#!/usr/bin/env python
"""CLAP stage-0 channel-pad probe (round-4 VERDICT item 9).

HTSAT stage 0 runs the whole-Swin-block kernel at C=96 — under the
128-lane MXU width — and dominates the tower residue. Hypothesis: zero-
padding the channel dim to 128 (weights padded with zero rows/cols, LN
divisor kept at 96 in a production version) trades +33% nominal FLOPs for
full-lane GEMMs. This probe times the kernel at the REAL stage-0 geometry
(N=2048 windows, L=64, heads=4, FF=384, shift mask present) with C=96 vs
C=128 — pure wall-clock comparison, values are random (a padded
production variant only changes numerics via the masked LN divisor).

    python scripts/probe_swin_pad128.py [--iters 50]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--group", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.swin_block import fused_swin_block
    from wise_tpu.utils.profiling import measure_roundtrip

    N, L, HEADS, FF, NWIN = 2048, 64, 4, 384, 64
    out = {"n": N, "l": L, "heads": HEADS, "ff": FF, "group": args.group}
    for label, c in (("c96", 96), ("c128pad", 128)):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (N, L, c), jnp.bfloat16)
        wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * 0.02
        wfc = jax.random.normal(ks[3], (c, FF), jnp.bfloat16) * 0.02
        wproj = jax.random.normal(ks[4], (FF, c), jnp.bfloat16) * 0.02
        bias = jax.random.normal(ks[5], (HEADS, L, L), jnp.float32) * 0.02
        mask = jnp.zeros((NWIN, L, L), jnp.float32)
        ln = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        bq = jnp.zeros((3 * c,), jnp.bfloat16)
        bo = jnp.zeros((c,), jnp.bfloat16)
        bf = jnp.zeros((FF,), jnp.bfloat16)
        bp = jnp.zeros((c,), jnp.bfloat16)

        @jax.jit
        def step(x, carry):
            o = fused_swin_block(
                x + (carry * 0).astype(x.dtype), ln, lnb, wqkv, bq, wo, bo,
                bias, mask, ln, lnb, wfc, bf, wproj, bp,
                heads=HEADS, act="gelu", group=args.group, flat=True,
            )
            return o[0, 0, 0].astype(jnp.float32)

        carry = step(x, jnp.float32(0))
        np.asarray(carry)  # compile + warm
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(x, carry)
        np.asarray(carry)
        dt = (time.perf_counter() - t0 - rt) / args.iters
        out[f"{label}_ms"] = round(dt * 1e3, 3)
    out["pad_speedup"] = round(out["c96_ms"] / out["c128pad_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
