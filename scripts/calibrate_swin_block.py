#!/usr/bin/env python
"""Calibrate ops/swin_block.py group sizes on hardware.

The analytic VMEM formula in swin_block_group() is ~3x more conservative
than Mosaic's real allocation (the same gap ops/block.py measured and
recalibrated around), so the fastest group per HTSAT stage shape must be
measured, not derived. This times fused_swin_block directly on
window-layout tensors for every HTSAT stage at the ingest batch (32) and
each candidate group — shifted (per-window mask riding the grid) and
unshifted — and prints the winners as a `_CALIBRATED_SWIN_BLOCK` dict to
paste into ops/swin_block.py.

Timing per CLAUDE.md: host-chained data-dependent iterations, one tiny
readback, tunnel roundtrip subtracted; variants interleaved in one
process so day-scale tunnel drift cancels.

    python scripts/calibrate_swin_block.py [--batch 32] [--iters 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--groups", type=int, nargs="*", default=None,
                   help="override candidate groups (default 128..1)")
    p.add_argument("--flat", action="store_true",
                   help="also probe the flat (merged-rows GEMM) variant "
                        "of each candidate group")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clap.model import (
        _relative_position_index,
        _shift_attn_mask,
    )
    from wise_tpu.ops.swin_block import fused_swin_block, swin_block_group

    from wise_tpu.utils.profiling import measure_roundtrip

    roundtrip = measure_roundtrip()
    out = {"batch": args.batch,
           "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}

    window = 8
    L = window * window
    # HTSAT-Swin stages at spec 1024x64, patch 4, freq_ratio 4
    stages = [  # (res, C, heads)
        (64, 96, 4), (32, 192, 8), (16, 384, 16), (8, 768, 32)
    ]
    key = jax.random.PRNGKey(0)
    idx = _relative_position_index(window)

    def timed(fn, *arrays):
        def step(c, *a):
            return fn(*a, c)

        jstep = jax.jit(step)
        np.asarray(jstep(jnp.float32(0), *arrays))
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jstep(c, *arrays)
        np.asarray(c)
        return (time.perf_counter() - t0 - roundtrip) / args.iters

    results = {}
    for res, c, heads in stages:
        n_win = (res // window) ** 2
        n = args.batch * n_win
        ff = 4 * c
        x = (0.1 * jax.random.normal(key, (n, L, c))).astype(jnp.bfloat16)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        wqkv = (0.02 * jax.random.normal(k1, (c, 3 * c))).astype(jnp.bfloat16)
        wo = (0.02 * jax.random.normal(k2, (c, c))).astype(jnp.bfloat16)
        wfc = (0.02 * jax.random.normal(k3, (c, ff))).astype(jnp.bfloat16)
        wproj = (0.02 * jax.random.normal(k4, (ff, c))).astype(jnp.bfloat16)
        ones_c = jnp.ones((c,), jnp.float32)
        zer_c = jnp.zeros((c,), jnp.float32)
        table = 0.02 * jax.random.normal(key, ((2 * window - 1) ** 2, heads))
        bias = jnp.transpose(
            table[idx.reshape(-1)].reshape(L, L, heads), (2, 0, 1)
        )
        shift_mask = jnp.asarray(
            _shift_attn_mask(res, res, window, window // 2)
        )
        analytic = swin_block_group(n, L, c, heads, None, ff)
        cands = args.groups or [g for g in (128, 64, 32, 16, 8, 4, 2, 1)
                                if n % g == 0]
        for masked in (False, True):
            mask = shift_mask if masked else None
            if masked and n_win == 1:
                continue  # stage 3 has no shifted window (single window)
            shape_key = f"C{c}_{'shift' if masked else 'noshift'}"
            rows = {}
            for g in cands:
                if masked and (n_win % g and g % n_win):
                    continue
                for flat in ((False, True) if args.flat else (False,)):

                    def f(xx, cc, g=g, mask=mask, flat=flat):
                        return jnp.sum(
                            fused_swin_block(
                                xx + cc.astype(xx.dtype) * 0,
                                ones_c, zer_c, wqkv,
                                jnp.zeros((3 * c,)), wo, zer_c, bias, mask,
                                ones_c, zer_c, wfc, jnp.zeros((ff,)),
                                wproj, zer_c, heads=heads, group=g,
                                flat=flat,
                            )[:, 0, 0].astype(jnp.float32)
                        )

                    label = f"{g}flat" if flat else g
                    try:
                        rows[label] = round(timed(f, x) * 1e3, 3)
                    except Exception as e:  # Mosaic VMEM OOM etc.
                        rows[label] = f"fail: {str(e)[:80]}"
            numeric = {g: t for g, t in rows.items()
                       if isinstance(t, float)}
            results[shape_key] = {
                "n_windows_total": n, "analytic_group": analytic,
                "times_ms": rows,
                "best": (min(numeric, key=numeric.get)
                         if numeric else None),
            }
    out["stages"] = results
    out["calibration_dict"] = {
        f"(64, {c})": results.get(f"C{c}_shift", results[f"C{c}_noshift"])[
            "best"
        ]
        for _, c, _ in stages
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
