#!/usr/bin/env python
"""50M-row IVF-PQ search latency on one real TPU chip (docs/Scale-100M.md).

Codes are generated device-side (50M real vectors cannot transit the dev
tunnel, and ADC latency depends only on code bytes + page counts, not
contents). Uniform cells of N/nlist rows; nlist follows the reference
heuristic 10*sqrt(N).

    python scripts/bench_50m_pq.py [--n 50000000] [--nprobes 64 1024]

Prints one JSON line with ms/query per nprobe and the device memory story.
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def measure_roundtrip():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    np.asarray(f(jnp.zeros((1,))))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(jnp.zeros((1,))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=50_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--lpad", type=int, default=128)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--nprobes", type=int, nargs="+", default=[64, 1024])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.ivf_paged import default_chunk, ivfpq_search_paged

    N, D, M, LPAD, K = args.n, args.d, args.m, args.lpad, args.k
    nlist = int(10 * math.sqrt(N))
    # uniform cells, page-aligned: cell length rounded to a LPAD multiple
    cell_len = max(LPAD, (N // nlist // LPAD) * LPAD)
    nlist = N // cell_len
    N = nlist * cell_len
    p0 = cell_len // LPAD
    total = nlist * p0
    print(f"# N={N} nlist={nlist} cell_len={cell_len} pages={total} "
          f"codes={(total+1)*LPAD*M/1e9:.2f} GB "
          f"page_rows={(total+1)*LPAD*4/1e9:.2f} GB", file=sys.stderr)

    codes = jax.jit(
        lambda k: jax.random.randint(k, (total + 1, LPAD, M), 0, 256,
                                     jnp.uint8)
    )(jax.random.PRNGKey(0))
    page_rows = jnp.concatenate([
        jnp.arange(total * LPAD, dtype=jnp.int32).reshape(total, LPAD),
        jnp.full((1, LPAD), -1, jnp.int32),
    ])
    page_first = jnp.arange(nlist, dtype=jnp.int32) * p0
    page_count = jnp.full((nlist,), p0, jnp.int32)
    centroids = jax.random.normal(jax.random.PRNGKey(1), (nlist, D))
    books = jax.random.normal(jax.random.PRNGKey(2), (M, 256, D // M))
    qs = jax.random.normal(jax.random.PRNGKey(3), (20, D), jnp.float32)

    out = {"n": N, "d": D, "m": M, "nlist": nlist, "k": K,
           "device_gb": round(((total + 1) * LPAD * (M + 4)
                               + nlist * D * 4 + M * 256 * (D // M) * 4)
                              / 1e9, 2)}
    for nprobe in args.nprobes:
        budget = nprobe * p0
        chunk = default_chunk(LPAD, D, budget)

        @jax.jit
        def loop(qs, codes, page_first, page_count, page_rows, centroids,
                 books):
            def body(i, c):
                v, _ = ivfpq_search_paged(
                    (qs[i] + c * 0)[None], centroids, page_first,
                    page_count, codes, page_rows, books,
                    nprobe=nprobe, budget=budget, chunk=chunk, k=K,
                )
                return v[0, 0]

            return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

        a = (qs, codes, page_first, page_count, page_rows, centroids, books)
        np.asarray(loop(*a))
        rt = measure_roundtrip()
        t0 = time.perf_counter()
        np.asarray(loop(*a))
        dt = (time.perf_counter() - t0 - rt) / 20
        out[f"ms_per_query_nprobe{nprobe}"] = round(dt * 1e3, 3)
        out[f"probed_rows_nprobe{nprobe}"] = nprobe * cell_len
    print(json.dumps(out))


if __name__ == "__main__":
    main()
