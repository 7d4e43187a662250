#!/usr/bin/env python
"""Per-component benchmark suite (run on real TPU hardware; see CLAUDE.md
for the tunnel timing methodology). Prints one JSON object per component.

    python scripts/bench_components.py [--quick]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def roundtrip():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    np.asarray(f(jnp.zeros((1,))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(jnp.zeros((1,))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_decode(out):
    import tempfile

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from media_fixtures import make_video

    from wise_tpu.io.decode import iter_video_frames

    d = Path(tempfile.mkdtemp())
    make_video(d / "v.mp4", seconds=30, fps=30, size=(640, 480))
    t0 = time.time()
    n = sum(len(f) for f, _ in iter_video_frames(d / "v.mp4", 2.0, 8))
    dt = time.time() - t0
    out["decode"] = {
        "source": "30s 640x480@30fps mp4, sampled 2fps",
        "sampled_frames": n,
        "src_frames_per_s_per_core": round(900 / dt, 1),
        "realtime_x": round(30 / dt, 1),
    }


def bench_encoder(out, rt, quick):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wise_tpu.models.clip.model import CLIP, get_clip_config
    from wise_tpu.models.clip.preprocess import preprocess_images

    for name in ("ViT-B-32",) if quick else ("ViT-B-32", "ViT-L-14"):
        config = dataclasses.replace(
            get_clip_config(name), dtype=jnp.bfloat16, fused_attention=True
        )
        model = CLIP(config)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, config.image_size, config.image_size, 3)),
            jnp.zeros((1, config.context_length), jnp.int32),
        )
        B = 256 if name != "ViT-B-32" else 512

        @jax.jit
        def step(params, frames, carry):
            x = preprocess_images(
                frames + (carry * 0).astype(frames.dtype), config.image_size
            )
            return model.apply(params, x, method=CLIP.encode_image)[0, 0]

        frames = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (B, 256, 320, 3), dtype=np.uint8
            )
        )
        carry = step(params, frames, jnp.float32(0))
        np.asarray(carry)
        iters = 5 if quick else 10
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(params, frames, carry)
        np.asarray(carry)
        dt = time.perf_counter() - t0 - rt
        out[f"encoder_{name}"] = {
            "batch": B,
            "frames_per_s_per_chip_bf16": round(B * iters / dt, 1),
        }


def bench_search(out, rt, quick):
    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.topk import int8_candidates, two_stage_topk

    N, D, K = 1_048_576, 512, 100
    db32 = jax.jit(
        lambda k: jax.random.normal(k, (N, D), jnp.float32)
    )(jax.random.PRNGKey(0))
    variants = {"f32": db32, "bf16": db32.astype(jnp.bfloat16)}
    qs = jax.random.normal(jax.random.PRNGKey(1), (20, D), jnp.float32)

    # int8 storage: device candidate scan (4x less HBM than f32) + host f32
    # rerank of 4k candidates (the production int8 path in feature_index)
    @jax.jit
    def quant(db):
        scales = jnp.max(jnp.abs(db), axis=1) / 127.0
        codes = jnp.rint(db / scales[:, None]).astype(jnp.int8)
        return codes, scales

    codes, scales = quant(db32)

    @jax.jit
    def int8_loop(qs, codes, scales):
        def body(i, c):
            v, _ = int8_candidates(
                (qs[i] + c * 0)[None], codes, scales,
                n_valid=N, kc=4 * K, k=K,
            )
            return v[0, 0]

        return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

    np.asarray(int8_loop(qs, codes, scales))
    t0 = time.perf_counter()
    np.asarray(int8_loop(qs, codes, scales))
    dt_dev = (time.perf_counter() - t0 - rt) / 20
    # host rerank cost on a memmap-sized candidate gather
    host_vecs = np.random.default_rng(0).standard_normal(
        (4 * K, D)
    ).astype(np.float32)
    q0 = np.asarray(qs[0])
    t0 = time.perf_counter()
    for _ in range(50):
        s = host_vecs @ q0
        np.lexsort((np.arange(4 * K), -s))
    dt_rerank = (time.perf_counter() - t0) / 50
    out["int8_search_1M"] = {
        "k": K, "device_ms": round(dt_dev * 1e3, 3),
        "host_rerank_ms": round(dt_rerank * 1e3, 3),
        "ms_per_query": round((dt_dev + dt_rerank) * 1e3, 3),
    }

    for tag, db in variants.items():
        @jax.jit
        def loop(qs, db):
            def body(i, c):
                v, _ = two_stage_topk(
                    (qs[i] + c * 0)[None], db, n_valid=N, k=K
                )
                return v[0, 0]

            return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

        np.asarray(loop(qs, db))
        t0 = time.perf_counter()
        np.asarray(loop(qs, db))
        dt = (time.perf_counter() - t0 - rt) / 20
        out[f"exact_search_1M_{tag}"] = {
            "k": K, "ms_per_query": round(dt * 1e3, 3)
        }


def _uniform_paged_meta(n, nlist, lpad):
    """Uniform cells of n/nlist rows (page-aligned): page table + row map for
    a synthetic paged layout generated directly on device (uploading a 2 GB
    host array through the dev tunnel takes minutes and benchmarks nothing).
    The kernel cost depends only on page counts, not cell contents."""
    import jax
    import jax.numpy as jnp

    L = n // nlist
    assert L % lpad == 0 and n % nlist == 0
    p0 = L // lpad
    total = nlist * p0
    page_first = jnp.arange(nlist, dtype=jnp.int32) * p0
    page_count = jnp.full((nlist,), p0, jnp.int32)
    page_rows = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int32).reshape(total, lpad),
        jnp.full((1, lpad), -1, jnp.int32),
    ])
    return p0, total, page_first, page_count, page_rows


def bench_ivf(out, rt, quick):
    """Paged IVF-Flat (ops/ivf_paged.py) at 1M x 512 across the nprobe sweep
    up to the reference serve default 1024 (VERDICT round-1 weak item 1)."""
    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.ivf_paged import default_chunk, ivf_search_paged

    N, D, K, NLIST, LPAD = 1_048_576, 512, 100, 8192, 64
    p0, total, page_first, page_count, page_rows = _uniform_paged_meta(
        N, NLIST, LPAD
    )
    paged32 = jax.jit(
        lambda k: jax.random.normal(k, (total + 1, LPAD, D), jnp.float32)
    )(jax.random.PRNGKey(0))
    centroids = jax.random.normal(jax.random.PRNGKey(1), (NLIST, D))
    qs = jax.random.normal(jax.random.PRNGKey(3), (100, D), jnp.float32)
    cases = [(np_, dt_) for np_ in (8, 64, 256, 1024) for dt_ in ("f32",)]
    cases += [(1024, "bf16"), (256, "bf16")]
    if quick:
        cases = [(64, "f32"), (1024, "f32"), (1024, "bf16")]
    paged16 = None
    for nprobe, tag in cases:
        if tag == "bf16":
            if paged16 is None:
                paged16 = jax.jit(lambda x: x.astype(jnp.bfloat16))(paged32)
            db = paged16
        else:
            db = paged32
        budget = nprobe * p0
        chunk = default_chunk(LPAD, D, budget)

        @jax.jit
        def loop(qs, db):
            def body(i, c):
                v, _ = ivf_search_paged(
                    (qs[i] + c * 0)[None], centroids, page_first,
                    page_count, db, page_rows,
                    nprobe=nprobe, budget=budget, chunk=chunk, k=K,
                )
                return v[0, 0]

            return jax.lax.fori_loop(0, 100, body, jnp.float32(0))

        np.asarray(loop(qs, db))
        t0 = time.perf_counter()
        np.asarray(loop(qs, db))
        dt = (time.perf_counter() - t0 - rt) / 100
        out[f"ivf_paged_1M_nprobe{nprobe}_{tag}"] = {
            "k": K, "nlist": NLIST, "budget_pages": budget, "chunk": chunk,
            "ms_per_query": round(dt * 1e3, 3),
        }


def bench_ivfpq(out, rt, quick=False):
    """Paged IVF-PQ ADC (ops/ivf_paged.py) at 1M x 512, M 8, across the
    nprobe sweep up to the reference serve default 1024."""
    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.ivf_paged import default_chunk, ivfpq_search_paged

    N, D, K, NLIST, M, LPAD = 1_048_576, 512, 100, 8192, 8, 128
    p0, total, page_first, page_count, page_rows = _uniform_paged_meta(
        N, NLIST, LPAD
    )
    codes = jax.jit(
        lambda k: jax.random.randint(k, (total + 1, LPAD, M), 0, 256,
                                     jnp.uint8)
    )(jax.random.PRNGKey(0))
    centroids = jax.random.normal(jax.random.PRNGKey(1), (NLIST, D))
    books = jax.random.normal(jax.random.PRNGKey(2), (M, 256, D // M))
    qs = jax.random.normal(jax.random.PRNGKey(3), (100, D), jnp.float32)
    for nprobe in (64, 1024) if quick else (8, 64, 256, 1024):
        budget = nprobe * p0
        chunk = default_chunk(LPAD, D, budget)

        @jax.jit
        def loop(qs):
            def body(i, c):
                v, _ = ivfpq_search_paged(
                    (qs[i] + c * 0)[None], centroids, page_first,
                    page_count, codes, page_rows, books,
                    nprobe=nprobe, budget=budget, chunk=chunk, k=K,
                )
                return v[0, 0]

            return jax.lax.fori_loop(0, 100, body, jnp.float32(0))

        np.asarray(loop(qs))
        t0 = time.perf_counter()
        np.asarray(loop(qs))
        dt = (time.perf_counter() - t0 - rt) / 100
        out[f"ivfpq_paged_1M_nprobe{nprobe}"] = {
            "k": K, "M": M, "nlist": NLIST, "budget_pages": budget,
            "chunk": chunk, "ms_per_query": round(dt * 1e3, 3),
        }


def bench_clap(out, rt, quick=False):
    """CLAP audio encode throughput: 4 s 48 kHz segments -> log-mel (GEMM
    DFT) -> HTSAT-style Swin forward, the ingest audio hot path."""
    import os

    os.environ.setdefault("WISE_CHECKPOINT_DIR", "/tmp/nockpt")
    import jax.numpy as jnp

    from wise_tpu.models.clap.extractor import ClapExtractor

    fe = ClapExtractor("microsoft/clap/2023/benchmark")
    B = 16 if quick else 32
    seg = np.random.default_rng(0).standard_normal(
        (B, 4 * 48_000)
    ).astype(np.float32)
    pre = fe.preprocess_audio(seg)
    fe.extract_audio_features(pre)  # compile
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        feats = fe.extract_audio_features(pre)
    dt = (time.perf_counter() - t0) / iters
    out["clap_audio_encode"] = {
        "batch": B,
        "segments_per_s_per_chip": round(B / dt, 1),
        "audio_seconds_per_s": round(4 * B / dt, 1),
        "note": "host round trip per call included (extractor API)",
    }


def bench_pallas_threshold(out, rt, quick=False):
    """Threshold-skip Pallas scan (ops/pallas_topk.py pallas_topk_threshold)
    vs the pure matmul floor and the production XLA two-stage path at
    1M x 512 (VERDICT round-1 item 6: target <= matmul + 10% f32; a bench
    row lands in BENCHMARKS.md either way)."""
    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.pallas_topk import pallas_topk_threshold

    N, D, K = 1_048_576, 512, 100
    db32 = jax.jit(
        lambda k: jax.random.normal(k, (N, D), jnp.float32)
    )(jax.random.PRNGKey(0))
    qs = jax.random.normal(jax.random.PRNGKey(1), (20, D), jnp.float32)
    variants = {"f32": db32}
    if not quick:
        variants["bf16"] = jax.jit(lambda x: x.astype(jnp.bfloat16))(db32)

    @jax.jit
    def matmul_loop(qs, db):
        def body(i, c):
            q = (qs[i] + c * 0)[None].astype(db.dtype)
            s = jax.lax.dot_general(
                q, db, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # full reduction: s[0,0] would let XLA slice db to one row
            return jnp.max(s)

        return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

    for tag, db in variants.items():
        @jax.jit
        def loop(qs, db):
            def body(i, c):
                v, _ = pallas_topk_threshold(
                    (qs[i] + c * 0)[None], db, n_valid=N, k=K
                )
                return v[0, 0]

            return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

        np.asarray(loop(qs, db))
        t0 = time.perf_counter()
        np.asarray(loop(qs, db))
        dt = (time.perf_counter() - t0 - rt) / 20

        np.asarray(matmul_loop(qs, db))
        t0 = time.perf_counter()
        np.asarray(matmul_loop(qs, db))
        dt_mm = (time.perf_counter() - t0 - rt) / 20
        out[f"pallas_threshold_1M_{tag}"] = {
            "k": K,
            "ms_per_query": round(dt * 1e3, 3),
            "matmul_floor_ms": round(dt_mm * 1e3, 3),
            "overhead_vs_matmul_pct": round((dt / dt_mm - 1) * 100, 1),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only",
                   choices=["decode", "search", "encoder", "ivf", "ivfpq",
                            "pallas", "clap"],
                   default=None)
    args = p.parse_args()
    out = {}
    rt = roundtrip()
    out["tunnel_roundtrip_ms"] = round(rt * 1e3, 1)
    if args.only in (None, "decode"):
        bench_decode(out)
    if args.only in (None, "search"):
        bench_search(out, rt, args.quick)
    if args.only in (None, "ivf"):
        bench_ivf(out, rt, args.quick)
    if args.only in (None, "ivfpq"):
        bench_ivfpq(out, rt, args.quick)
    if args.only in (None, "pallas"):
        bench_pallas_threshold(out, rt, args.quick)
    if args.only in (None, "clap"):
        bench_clap(out, rt, args.quick)
    if args.only in (None, "encoder"):
        bench_encoder(out, rt, args.quick)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
