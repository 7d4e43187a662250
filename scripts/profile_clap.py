#!/usr/bin/env python
"""Attribute the CLAP audio encoder's roofline (VERDICT round-2 weak #7).

Round-2 headline: 36.4 segments/s/chip at batch 32 (bench_components
--only clap) with no attribution. This decomposes the encode step on the
real chip:

  mel        GEMM log-mel frontend only (ops/mel.py)
  full       mel + HTSAT tower (the production path)
  tower      HTSAT only, mel precomputed
  stageN     tower truncated after stage N (per-stage cost by differencing)
  attn       standalone WindowAttention at stage-1 shapes vs its GEMM floor
  floor      analytic bf16 GEMM floor of the whole tower at 200 TF/s

--swin-ab additionally measures the full tower with the fused Swin
window-attention kernel (ops/swin_attention.py, WISE_FUSED_SWIN=1) vs the
XLA path back-to-back in one process (tunnel variance is day-scale, so
interleaved A/B is the only trustworthy comparison — CLAUDE.md).

Timing per CLAUDE.md: host-chained data-dependent iterations, one tiny
readback, tunnel roundtrip subtracted.

    python scripts/profile_clap.py [--batch 32] [--iters 10] [--swin-ab]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--swin-ab", action="store_true",
                   help="A/B the fused Swin ATTENTION kernel on the full "
                        "tower (whole-block kernel pinned off)")
    p.add_argument("--block-ab", action="store_true",
                   help="3-way A/B: whole-Swin-block kernel "
                        "(ops/swin_block.py) vs attention-kernel-only vs "
                        "pure XLA, interleaved")
    p.add_argument("--skip-stages", action="store_true",
                   help="skip the per-stage truncation runs (4 compiles)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clap.model import (
        CLAPConfig,
        HTSATEncoder,
        get_clap_config,
    )
    from wise_tpu.ops.mel import log_mel_spectrogram

    B = args.batch
    base = dataclasses.replace(get_clap_config("2023"), dtype=jnp.bfloat16)

    from wise_tpu.utils.profiling import measure_roundtrip

    roundtrip = measure_roundtrip()
    out = {"batch": B, "tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}

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

    # 7 s @ 44.1 kHz mono segments, generated on device
    wav = jax.random.normal(
        jax.random.PRNGKey(0), (B, int(base.sample_rate * base.duration))
    )

    def mel_of(w):
        return log_mel_spectrogram(
            w, sr=base.sample_rate, n_fft=base.n_fft,
            hop_length=base.hop_length, n_mels=base.n_mels,
            fmin=base.fmin, fmax=base.fmax,
        )

    t_mel = timed(lambda w, c: jnp.sum(mel_of(w + c * 0)[:, 0, 0]), wav)
    out["mel_ms"] = round(t_mel * 1e3, 2)
    mel = mel_of(wav)

    def tower_time(cfg):
        enc = HTSATEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(0), mel[:1])

        def f(m, c):
            return jnp.sum(enc.apply(params, m + c.astype(m.dtype) * 0)[:, 0])

        return timed(f, mel)

    t_tower = tower_time(base)
    out["tower_ms"] = round(t_tower * 1e3, 2)
    out["segments_per_s"] = round(B / (t_mel + t_tower), 1)

    if args.swin_ab:
        # fresh encoder+jit per call -> the env gate is re-read at trace
        # time; interleave twice to split drift from signal
        import os

        from wise_tpu.ops import swin_attention

        os.environ["WISE_FUSED_SWIN_BLOCK"] = "0"  # isolate the attn kernel
        ab = []
        for _ in range(2):
            pair = {}
            for flag in ("0", "1"):
                os.environ["WISE_FUSED_SWIN"] = flag
                pair[flag] = tower_time(base)
            ab.append(pair)
        # numerics: full-tower embeddings fused vs XLA on the same input
        def tower_out(flag):
            os.environ["WISE_FUSED_SWIN"] = flag
            enc = HTSATEncoder(base)
            params = enc.init(jax.random.PRNGKey(0), mel[:1])
            return np.asarray(
                jax.jit(lambda m: enc.apply(params, m))(mel)
            ).astype(np.float64)

        e0, e1 = tower_out("0"), tower_out("1")
        cos = (e0 * e1).sum(1) / (
            np.linalg.norm(e0, axis=1) * np.linalg.norm(e1, axis=1)
        )
        out["fused_swin_cos_min"] = round(float(cos.min()), 6)
        os.environ["WISE_FUSED_SWIN"] = "0"
        out["tower_xla_ms"] = [round(p["0"] * 1e3, 2) for p in ab]
        out["tower_fused_swin_ms"] = [round(p["1"] * 1e3, 2) for p in ab]
        # supports_fused_swin() falls back to XLA silently — assert the
        # kernel actually traced, or the A/B above compared XLA to itself
        out["fused_swin_engaged_traces"] = swin_attention.engaged_traces
        if not swin_attention.engaged_traces:
            out["fused_swin_engaged"] = False
            out["WARNING"] = ("fused Swin kernel never engaged — the gate "
                              "rejected every WindowAttention shape; the A/B "
                              "columns are XLA vs XLA")

    if args.block_ab:
        import os

        from wise_tpu.ops import swin_block as SBK

        variants = {
            "block": {"WISE_FUSED_SWIN_BLOCK": "1", "WISE_FUSED_SWIN": "0"},
            "attn": {"WISE_FUSED_SWIN_BLOCK": "0", "WISE_FUSED_SWIN": "1"},
            "xla": {"WISE_FUSED_SWIN_BLOCK": "0", "WISE_FUSED_SWIN": "0"},
        }
        times = {k: [] for k in variants}
        for _ in range(2):                      # interleaved vs drift
            for k, env in variants.items():
                os.environ.update(env)
                times[k].append(round(tower_time(base) * 1e3, 2))
        out["block_ab_tower_ms"] = times
        out["fused_block_engaged_traces"] = SBK.engaged_traces
        if not SBK.engaged_traces:
            out["WARNING_block"] = ("whole-block kernel never engaged — "
                                    "'block' column is a fallback path")

        def tower_out_env(env):
            os.environ.update(env)
            enc = HTSATEncoder(base)
            params = enc.init(jax.random.PRNGKey(0), mel[:1])
            return np.asarray(
                jax.jit(lambda m: enc.apply(params, m))(mel)
            ).astype(np.float64)

        e0 = tower_out_env(variants["xla"])
        e1 = tower_out_env(variants["block"])
        cos = (e0 * e1).sum(1) / (
            np.linalg.norm(e0, axis=1) * np.linalg.norm(e1, axis=1)
        )
        out["fused_block_cos_min"] = round(float(cos.min()), 6)
        os.environ["WISE_FUSED_SWIN_BLOCK"] = "1"
        os.environ["WISE_FUSED_SWIN"] = "1"

    if not args.skip_stages:
        # per-stage: truncate depths progressively
        prev = 0.0
        for n in range(1, 5):
            cfg = dataclasses.replace(base, depths=tuple(base.depths[:n]),
                                      num_heads=tuple(base.num_heads[:n]))
            t = tower_time(cfg)
            out[f"stage{n-1}_ms"] = round((t - prev) * 1e3, 2)
            prev = t

    # analytic GEMM floor of the tower (bf16 ~200 TF/s)
    flops = 0
    res, dim = 64, base.embed_dim
    for depth, heads in zip(base.depths, base.num_heads):
        L = res * res
        per_block = (
            2 * L * dim * 3 * dim     # qkv
            + 2 * L * dim * dim       # proj
            + 2 * 2 * L * 64 * dim    # window attention (l=64 keys)
            + 2 * L * dim * 4 * dim * 2  # mlp fc + proj
        )
        flops += depth * per_block
        res //= 2
        dim *= 2
    flops *= B
    out["tower_gemm_floor_ms"] = round(flops / 200e12 * 1e3, 2)
    out["tower_gflop_per_batch"] = round(flops / 1e9, 1)
    out["mfu_pct"] = round(
        100 * flops / 200e12 / t_tower, 1
    )

    # standalone stage-1 window attention vs its GEMM floor
    from wise_tpu.models.clap.model import WindowAttention

    nwin = B * 64  # stage 1: 64 windows/sample
    x = (0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (nwin, 64, base.embed_dim)
    )).astype(jnp.bfloat16)
    wa = WindowAttention(base.embed_dim, base.num_heads[0], base.window_size,
                        dtype=jnp.bfloat16)
    wparams = wa.init(jax.random.PRNGKey(0), x)

    def fattn(xx, c):
        return jnp.sum(wa.apply(wparams, xx + c.astype(xx.dtype) * 0)[:, 0, 0]
                       .astype(jnp.float32))

    t_attn = timed(fattn, x)
    d = base.embed_dim
    attn_flops = nwin * (2 * 64 * d * 3 * d + 2 * 64 * d * d
                         + 4 * 64 * 64 * d)
    out["stage1_attn_ms"] = round(t_attn * 1e3, 2)
    out["stage1_attn_floor_ms"] = round(attn_flops / 200e12 * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
