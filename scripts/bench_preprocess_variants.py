#!/usr/bin/env python
"""Probe device-preprocess variants on the real chip (round 3).

The production step decomposition (BENCHMARKS.md round-3 section) charges
~3.3 ms of the 38.4 ms ViT-B/32 step to the fused uint8 preprocess
(crop -> f32 -> bicubic antialias resize -> normalize). The resize is
LINEAR in the input, so its exact per-axis weights can be extracted by
resizing identity matrices once; applying them as two einsum GEMMs is
mathematically the same map (f32 association aside) but lets XLA put the
work on the MXU with layouts it chooses, instead of whatever
jax.image.resize's general scale-and-translate lowers to.

Variants:
  current   preprocess_images (jax.image.resize bicubic antialias)
  gemm      crop -> f32 -> Wh @ x @ Ww einsums (exact extracted weights)
  gemm_cf   same, staged channels-first so both contractions are
            lane-contiguous
  gemm_bf16 gemm with bf16 GEMM inputs (numerics delta reported; the
            tower runs bf16 anyway)

Reports ms/call and max|delta| vs current on the same uint8 batch.

    python scripts/bench_preprocess_variants.py [--batch 512] [--iters 30]
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
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--target", type=int, default=224)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.preprocess import (
        OPENAI_DATASET_MEAN,
        OPENAI_DATASET_STD,
        preprocess_images,
    )
    from wise_tpu.utils.profiling import measure_roundtrip

    B, H, W, S = args.batch, args.height, args.width, args.target
    square = min(H, W)

    # exact separable weights: resize is linear, so resizing an identity
    # matrix along one axis yields that axis's full weight matrix
    eye = np.eye(square, dtype=np.float32)
    w_ax = np.asarray(
        jax.image.resize(eye, (S, square), method="bicubic", antialias=True)
    )  # (S, square): rows are output taps over input positions
    wh = jnp.asarray(w_ax)          # contract input H
    ww = jnp.asarray(w_ax.T)        # (square, S): contract input W
    mean_a = jnp.asarray(OPENAI_DATASET_MEAN, jnp.float32)
    std_a = jnp.asarray(OPENAI_DATASET_STD, jnp.float32)

    def crop(frames):
        top = (H - square) // 2
        left = (W - square) // 2
        return jax.lax.dynamic_slice(
            frames, (0, top, left, 0), (B, square, square, 3)
        )

    def v_current(frames):
        return preprocess_images(frames, S)

    def v_gemm(frames):
        x = crop(frames).astype(jnp.float32) / 255.0
        x = jnp.einsum("Hh,bhwc->bHwc", wh, x)
        x = jnp.einsum("wW,bHwc->bHWc", ww, x)
        return (x - mean_a) / std_a

    def v_gemm_cf(frames):
        x = crop(frames).astype(jnp.float32) / 255.0
        x = jnp.transpose(x, (0, 3, 1, 2))            # (B, 3, h, w)
        x = jnp.einsum("Hh,bchw->bcHw", wh, x)
        x = jnp.einsum("bcHw,wW->bcHW", x, ww)
        x = jnp.transpose(x, (0, 2, 3, 1))
        return (x - mean_a) / std_a

    def v_gemm_bf16(frames):
        # weak-typed scalar: a np.float32 divisor would promote x to f32
        # and the first einsum would measure an f32xbf16 GEMM
        x = crop(frames).astype(jnp.bfloat16) / 255.0
        x = jnp.einsum("Hh,bhwc->bHwc", wh.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = jnp.einsum("wW,bHwc->bHWc", ww.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        return (x - mean_a) / std_a

    # ---- round-3 continuation: fold the crop + 1/255 scale into the
    # weights so the 2x-bigger crop/cast intermediate (audit_hlo.py found
    # a 201 MB materialisation at batch 512) never exists — the einsums
    # read the uint8 batch directly. The cropped-out rows/cols are zero
    # columns in the folded weights (+25% FLOPs on the cropped axis's
    # contraction, traded against the saved HBM round trip).
    top = (H - square) // 2
    left = (W - square) // 2
    whf = np.zeros((S, H), np.float32)
    whf[:, top:top + square] = w_ax
    wwf = np.zeros((W, S), np.float32)
    wwf[left:left + square, :] = w_ax.T
    whf_s = jnp.asarray(whf / 255.0, jnp.bfloat16)   # 1/255 on 1st einsum
    whf_b = jnp.asarray(whf, jnp.bfloat16)
    wwf_s = jnp.asarray(wwf / 255.0, jnp.bfloat16)
    wwf_b = jnp.asarray(wwf, jnp.bfloat16)

    def v_fold_hw(frames):
        x = frames.astype(jnp.bfloat16)
        x = jnp.einsum("Hh,bhwc->bHwc", whf_s, x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = jnp.einsum("wW,bHwc->bHWc", wwf_b, x,
                       preferred_element_type=jnp.float32)
        return (x - mean_a) / std_a

    def v_fold_wh(frames):
        x = frames.astype(jnp.bfloat16)
        x = jnp.einsum("wW,bhwc->bhWc", wwf_s, x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = jnp.einsum("Hh,bhWc->bHWc", whf_b, x,
                       preferred_element_type=jnp.float32)
        return (x - mean_a) / std_a

    roundtrip = measure_roundtrip()
    print(f"roundtrip {roundtrip*1e3:.1f} ms; batch {B} {H}x{W} -> {S}")

    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, H, W, 3), np.uint8)
    )

    def timed(fn):
        def step(c, fr):
            out = fn(fr + (c * 0).astype(fr.dtype))
            return out[0, 0, 0, 0].astype(jnp.float32)

        jstep = jax.jit(step)
        np.asarray(jstep(jnp.float32(0), frames))
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jstep(c, frames)
        np.asarray(c)
        return (time.perf_counter() - t0 - roundtrip) / args.iters

    ref = np.asarray(v_current(frames), np.float32)
    for name, fn in (("current", v_current), ("gemm", v_gemm),
                     ("gemm_cf", v_gemm_cf), ("gemm_bf16", v_gemm_bf16),
                     ("fold_hw", v_fold_hw), ("fold_wh", v_fold_wh)):
        try:
            got = np.asarray(fn(frames), np.float32)
            delta = float(np.max(np.abs(got - ref)))
            t = timed(fn)
            print(f"{name:10s}: {t*1e3:7.3f} ms  max|d|={delta:.2e}")
        except Exception as e:
            print(f"{name:10s}: FAIL {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
