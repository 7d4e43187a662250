#!/usr/bin/env python
"""IVF / IVF-PQ recall + latency sweep on clustered synthetic data.

Protocol and table format follow the reference's
docs/Search-Index-Evaluation.md (R0@K = fraction of exact top-K recovered;
R1@N,K = fraction of queries whose exact top-1 appears in the ANN top-N).
Data is a Gaussian mixture on the unit sphere — clustered like real
embeddings, which is what makes IVF recall non-trivial (uniform data makes
every cell equidistant and flatters recall).

Residuals around each center use a power-law-decaying spectrum in a random
rotated basis (--spectrum-decay alpha; per-dim scale (1+d)^-alpha, alpha=0
= isotropic). Isotropic residuals are PQ's worst case — every subvector is
a full-rank Gaussian that 256 codewords cannot cover, so IVF-PQ recall
collapses regardless of nprobe — while real CLIP/CLAP residual spectra
decay fast (a few dozen effective dims out of 512/768), which is what makes
the reference's published 0.904 R0@20 on 55M real vectors reachable at
M=8. alpha=0.5 gives ~23 effective dims at D=512, in the realistic range.
The default --centers 16384 exceeds nlist so k-means cells cannot simply
memorise mixture centers (IVF recall stays non-trivial).

Everything (generation, k-means, cell-sort, paged layout, exact ground
truth, searches) runs ON DEVICE: the dev tunnel uploads at ~9 MB/s, so
shipping a host-built matrix would dominate the wall clock. Only the PQ
codebook training samples are pulled to the host (train_pq is numpy).

    python scripts/eval/index_recall_sweep.py [--n 500000] [--d 256] \
        [--queries 128] [--out recall.json]

Prints a JSON report and a markdown table matching the reference's columns.
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--queries", type=int, default=128)
    p.add_argument("--centers", type=int, default=16384)
    p.add_argument("--noise", type=float, default=0.35)
    p.add_argument("--spectrum-decay", type=float, default=0.5,
                   help="residual spectrum (1+d)^-alpha in a random rotated "
                        "basis; 0 = isotropic (PQ worst case)")
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--nprobes", type=int, nargs="+",
                   default=[8, 64, 256, 1024])
    p.add_argument("--pq-m", type=int, default=8)
    p.add_argument("--pq-variant", choices=["plain", "opq", "both"],
                   default="both",
                   help="plain subspace PQ, the OPQ learned rotation "
                        "(the production build default), or both")
    p.add_argument("--refine", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="also sweep each PQ variant with the int8 refine "
                        "rescore of rerank-mult*k ADC candidates "
                        "(config.pq_refine, the production build default); "
                        "the rescore runs on device here where production "
                        "reranks from the host memmap (~0.1 ms for 400 "
                        "rows) — same math, same candidates")
    p.add_argument("--rerank-mult", type=int, default=4)
    p.add_argument("--only", choices=["flat", "pq", "both"], default="both")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.ivf_paged import (
        default_chunk,
        ivf_search_paged,
        ivfpq_search_paged,
        paged_budget,
    )
    from wise_tpu.ops.kmeans import _assign, _update
    from wise_tpu.ops.pq import train_pq
    from wise_tpu.ops.topk import two_stage_topk

    N, D, Q, K = args.n, args.d, args.queries, args.topk
    nlist = int(
        (3 if N < 200_000 else 10) * math.sqrt(N)  # reference heuristic
    )
    print(f"# N={N} D={D} nlist={nlist} centers={args.centers} "
          f"noise={args.noise}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq, kqn, ki, kr = jax.random.split(key, 7)

    # noise is the RMS NORM of the perturbation relative to the unit
    # center (per-dim sigma = noise/sqrt(D)); noise=0.35 puts cos(x, center)
    # ~ 0.94 — strongly clustered, like real CLIP embeddings. A per-dim
    # sigma of 0.35 would give a noise norm of 5.6 at D=256, i.e. nearly
    # uniform data, which is meaningless for an IVF recall study.
    # The residual spectrum decays as (1+d)^-alpha in a random rotated
    # basis, scaled so the expected residual norm stays `noise` (see
    # module docstring).
    alpha = args.spectrum_decay

    @jax.jit
    def gen():
        spec = (1.0 + jnp.arange(D, dtype=jnp.float32)) ** (-alpha)
        spec = spec * jnp.sqrt(D / jnp.sum(spec**2))
        rot, _ = jnp.linalg.qr(jax.random.normal(kr, (D, D)))
        sigma = args.noise / math.sqrt(D)

        def resid(k, n):
            return (jax.random.normal(k, (n, D)) * spec) @ rot * sigma

        centers = jax.random.normal(kc, (args.centers, D))
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        which = jax.random.randint(ka, (N,), 0, args.centers)
        x = centers[which] + resid(kn, N)
        x /= jnp.linalg.norm(x, axis=1, keepdims=True)
        qw = jax.random.randint(kq, (Q,), 0, args.centers)
        q = centers[qw] + resid(kqn, Q)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return x, q

    x, q = gen()

    # --- k-means (device loop, reference train count = min(N, 100*nlist))
    t0 = time.time()
    init_idx = jax.random.choice(ki, N, (nlist,), replace=False)
    cents = x[init_idx]
    for _ in range(15):
        a = _assign(x, cents)
        cents, _ = _update(x, a, nlist)
    assign = _assign(x, cents)
    print(f"# kmeans: {time.time()-t0:.1f}s", file=sys.stderr)

    # --- cell-sort + offsets + paged layouts, on device
    @jax.jit
    def sort_and_offsets(x, assign):
        order = jnp.argsort(assign, stable=True)
        xs = x[order]
        counts = jnp.bincount(assign, length=nlist)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        return xs, offsets, order

    xs, offsets, order = sort_and_offsets(x, assign)
    offsets_h = np.asarray(offsets).astype(np.int64)
    lens = np.diff(offsets_h)
    # HBM discipline (the OPQ+refine pass OOM'd a 16 GB chip with the
    # full-sweep residents): x is superseded by xs, assign/order by
    # offsets — free the device buffers now (~2 GB at 1M x 512)
    x.delete()
    assign.delete()
    del x, assign, order

    def device_paged(data, lpad):
        """build_paged_layout, but with device scatters (no host copy)."""
        page_count = ((lens + lpad - 1) // lpad).astype(np.int32)
        page_first = np.zeros(nlist, np.int32)
        np.cumsum(page_count[:-1], out=page_first[1:])
        total = int(page_count.sum())
        cell_of_row = np.repeat(np.arange(nlist), lens)
        dest = (page_first[cell_of_row].astype(np.int64) * lpad
                + (np.arange(N) - offsets_h[cell_of_row]))
        dest_d = jnp.asarray(dest)  # (N,) int64 upload: 4-8 MB, fine

        @jax.jit
        def scatter(data):
            w = data.shape[1]
            paged = jnp.zeros(((total + 1) * lpad, w), data.dtype)
            paged = paged.at[dest_d].set(data)
            rows = jnp.full(((total + 1) * lpad,), -1, jnp.int32)
            rows = rows.at[dest_d].set(jnp.arange(N, dtype=jnp.int32))
            return (paged.reshape(total + 1, lpad, w),
                    rows.reshape(total + 1, lpad))

        paged, rows = scatter(data)
        return paged, rows, page_first, page_count

    # --- exact ground truth (device scan)
    n_pad = ((N + 4095) // 4096) * 4096
    xs_pad = jnp.pad(xs, ((0, n_pad - N), (0, 0)))
    ref_vals, ref_rows = two_stage_topk(q, xs_pad, n_valid=N, k=K)
    ref_rows = np.asarray(ref_rows)
    # the padded f32 ground-truth copy (~2.1 GB at 1M x 512) is dead once
    # ref_rows is on the host — free it before the sweeps build their own
    # device structures (same HBM discipline as the deletes below)
    xs_pad.delete()
    del xs_pad

    def metrics(rows):
        rows = np.asarray(rows)
        out = {}
        for kk in (10, 20, 100):
            hits = sum(
                len(set(ref_rows[i, :kk]) & set(rows[i, :kk]))
                for i in range(Q)
            )
            out[f"R0@{kk}"] = round(hits / (Q * kk), 3)
        for nn in (20, 30):
            out[f"R1@{nn},{K}"] = round(
                float(np.mean([
                    ref_rows[i, 0] in rows[i, :nn] for i in range(Q)
                ])), 3,
            )
        return out

    import functools

    @functools.partial(jax.jit, static_argnames=("kernel", "static"))
    def _timing_loop(q, arrays, kernel, static):
        # arrays pass as jit ARGUMENTS: a closure would embed multi-hundred-
        # MB device buffers as HLO constants, and the dev tunnel's remote
        # compile rejects oversized program bodies (HTTP 413)
        def body(i, c):
            v, _ = kernel((q[i % Q] + c * 0)[None], *arrays, **dict(static))
            return v[0, 0]
        return jax.lax.fori_loop(0, 100, body, jnp.float32(0))

    def roundtrip():
        f = jax.jit(lambda a: a + 1)
        np.asarray(f(jnp.zeros((1,))))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(f(jnp.zeros((1,))))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rt = roundtrip()

    def timed(kernel, arrays, static, queries=None):
        """p50 via 100 chained on-device iterations, measured roundtrip
        subtracted (a hardcoded 33 ms would skew results on any host whose
        readback latency differs from the dev tunnel's)."""
        st = tuple(sorted(static.items()))
        qv = q if queries is None else queries
        np.asarray(_timing_loop(qv, arrays, kernel, st))
        t0 = time.perf_counter()
        np.asarray(_timing_loop(qv, arrays, kernel, st))
        return (time.perf_counter() - t0 - rt) / 100

    report = {"n": N, "d": D, "nlist": nlist, "topk": K,
              "centers": args.centers, "noise": args.noise,
              "spectrum_decay": alpha, "rows": []}

    # --- IVF-Flat sweep
    LPAD = 64
    if args.only in ("flat", "both"):
        # only build the f32 row pages when the flat sweep runs (~2.4 GB
        # at 1M x 512 — it OOM'd the --only pq run when unconditional)
        paged, prow, pfirst, pcount = device_paged(xs, LPAD)
        pfirst_d, pcount_d = jnp.asarray(pfirst), jnp.asarray(pcount)
    for nprobe in args.nprobes if args.only in ("flat", "both") else []:
        nprobe = min(nprobe, nlist)
        budget = paged_budget(pcount, nprobe)
        chunk = default_chunk(LPAD, D, budget)

        arrays = (cents, pfirst_d, pcount_d, paged, prow)
        static = dict(nprobe=nprobe, budget=budget, chunk=chunk, k=K)
        _, rows = ivf_search_paged(q, *arrays, **static)
        row = {"index": "IVF-Flat", "nprobe": nprobe, **metrics(rows),
               "ms_per_query": round(
                   timed(ivf_search_paged, arrays, static) * 1e3, 3)}
        report["rows"].append(row)
        print(f"# {row}", file=sys.stderr)
    if args.only in ("flat", "both"):
        paged.delete()
        prow.delete()
        del paged, prow

    # --- IVF-PQ sweep (codebooks trained on host from a residual sample).
    # Variants: plain subspace PQ and the OPQ learned rotation — the
    # production build default (feature_index._build_pq, opq=True). OPQ
    # stores ROTATED centroids and rotates queries once at dispatch, so
    # the search kernels are identical; this mirrors that exactly.
    M = args.pq_m
    cell_of_row = np.repeat(np.arange(nlist), lens)

    @jax.jit
    def residuals_of(xs, cents, cor):
        return xs - cents[cor]

    resid = residuals_of(xs, cents, jnp.asarray(cell_of_row))
    sample_idx = np.random.default_rng(0).choice(
        N, min(N, 100_000), replace=False
    )
    sample = np.asarray(resid[jnp.asarray(np.sort(sample_idx))])

    @jax.jit
    def encode(resid, books_d):
        # blocked so the (block, M, 256) score tensor stays small
        dsub = D // M
        block = 32768
        pad = (-N) % block
        rp = jnp.pad(resid, ((0, pad), (0, 0))).reshape(-1, block, M, dsub)
        c_sq = jnp.sum(books_d ** 2, axis=2)  # (M, 256)

        def blk(sub):
            scores = 2.0 * jnp.einsum("nmd,mkd->nmk", sub, books_d) - c_sq
            return jnp.argmax(scores, axis=2).astype(jnp.uint8)

        return jax.lax.map(blk, rp).reshape(-1, M)[:N]

    LPADQ = 128
    variants = {"both": ("plain", "opq"), "plain": ("plain",),
                "opq": ("opq",)}[args.pq_variant]

    # int8 refine rescore of ADC candidates, composed with the ADC kernel
    # so the timing loop measures the full production pipeline. Codes are
    # quantized in the variant's (possibly OPQ-rotated) basis: inner
    # products are rotation-invariant, so quality statistics match the
    # production layout, which stores the ORIGINAL basis and un-rotates
    # the query instead (feature_index._rerank_refine_candidates).
    @jax.jit
    def quantize_int8(x):
        absmax = jnp.max(jnp.abs(x), axis=1)
        scales = absmax / 127.0
        inv = jnp.where(absmax > 0, 1.0 / jnp.where(absmax == 0, 1, scales),
                        0.0)
        return jnp.rint(x * inv[:, None]).astype(jnp.int8), scales

    def make_refine_kernel(kc):
        def kernel(qr, cents_v, pfirst, pcount, paged, prow, books,
                   codes_i8, scales_r, *, nprobe, budget, chunk, k):
            vals, rows = ivfpq_search_paged(
                qr, cents_v, pfirst, pcount, paged, prow, books,
                nprobe=nprobe, budget=budget, chunk=chunk, k=kc)
            safe = jnp.maximum(rows, 0)
            cand = codes_i8[safe].astype(jnp.float32)  # (Q, kc, D)
            s = jnp.einsum("qkd,qd->qk", cand, qr) * scales_r[safe]
            s = jnp.where(jnp.isneginf(vals), -jnp.inf, s)
            vv, ii = jax.lax.top_k(s, k)
            return vv, jnp.take_along_axis(rows, ii, axis=1)
        return kernel

    for variant in variants if args.only in ("pq", "both") else []:
        if variant == "opq":
            from wise_tpu.ops.pq import train_opq

            t0 = time.time()
            R, books = train_opq(sample, M, 256)
            print(f"# train_opq: {time.time()-t0:.1f}s", file=sys.stderr)
            R_d = jnp.asarray(R)
            rot = jax.jit(lambda a: a @ R_d)
            resid_v, cents_v, q_v = rot(resid), rot(cents), rot(q)
            # the unrotated residuals/rows are dead once rotated copies
            # exist — free 4 GB of HBM before building the rotated
            # paged/int8 structures. Only safe when no later variant will
            # read them again, hence the last-variant guard (a reordered
            # variants tuple must not raise on a deleted buffer mid-sweep)
            if variant == variants[-1]:
                resid.delete()
                xs_v = rot(xs)
                xs.delete()
            else:
                xs_v = rot(xs)
            label = f"IVF-PQ(M={M},OPQ)"
        else:
            books = train_pq(sample, M, 256)
            resid_v, cents_v, q_v, xs_v = resid, cents, q, xs
            label = f"IVF-PQ(M={M})"
        books_d = jnp.asarray(books)
        codes = encode(resid_v, books_d)
        pagedq, prowq, pfirstq, pcountq = device_paged(codes, LPADQ)
        pfirstq_d, pcountq_d = jnp.asarray(pfirstq), jnp.asarray(pcountq)
        if args.refine:
            codes_i8, scales_r = quantize_int8(xs_v)
            kc = min(args.rerank_mult * K, N)
            refine_kernel = make_refine_kernel(kc)
        for nprobe in args.nprobes:
            nprobe = min(nprobe, nlist)
            budget = paged_budget(pcountq, nprobe)
            chunk = default_chunk(LPADQ, D, budget)

            arrays = (cents_v, pfirstq_d, pcountq_d, pagedq, prowq, books_d)
            static = dict(nprobe=nprobe, budget=budget, chunk=chunk, k=K)
            _, rows = ivfpq_search_paged(q_v, *arrays, **static)
            row = {"index": label, "nprobe": nprobe, **metrics(rows),
                   "ms_per_query": round(
                       timed(ivfpq_search_paged, arrays, static,
                             queries=q_v) * 1e3, 3)}
            report["rows"].append(row)
            print(f"# {row}", file=sys.stderr)
            if not args.refine:
                continue
            r_arrays = arrays + (codes_i8, scales_r)
            r_static = dict(nprobe=nprobe,
                            budget=paged_budget(pcountq, nprobe),
                            chunk=chunk, k=K)
            _, r_rows = refine_kernel(q_v, *r_arrays, **r_static)
            row = {"index": label.replace(")", ",int8r)"), "nprobe": nprobe,
                   **metrics(r_rows),
                   "ms_per_query": round(
                       timed(refine_kernel, r_arrays, r_static,
                             queries=q_v) * 1e3, 3)}
            report["rows"].append(row)
            print(f"# {row}", file=sys.stderr)
        # free this variant's device structures before the next one builds
        # its own (int8 rows alone are 0.5 GB at 1M x 512)
        pagedq.delete()
        prowq.delete()
        if args.refine:
            codes_i8.delete()
            scales_r.delete()

    print(json.dumps(report, indent=2))
    # markdown table in the reference's column style
    print("\n| Index | nprobe | R0@10 | R0@20 | R0@100 | R1@20,100 | "
          "R1@30,100 | ms/query |")
    print("|---|---|---|---|---|---|---|---|")
    for r in report["rows"]:
        print(f"| {r['index']} | {r['nprobe']} | {r['R0@10']} | {r['R0@20']} "
              f"| {r['R0@100']} | {r['R1@20,100']} | {r['R1@30,100']} "
              f"| {r['ms_per_query']} |")
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
