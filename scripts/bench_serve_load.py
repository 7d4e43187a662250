#!/usr/bin/env python
"""Measure REST serving throughput under concurrent load, coalesced vs not.

The reference serves each request as its own batch-1 embed + faiss search
(/root/reference/api/routes.py:1395-1442). The engine coalesces concurrent
requests into single device dispatches (api/coalesce.py); this benchmark
quantifies the win on real hardware by driving one in-process server with a
closed-loop client pool over real HTTP, A/B back-to-back in one process
(tunnel variance is day-scale — CLAUDE.md).

Builds a synthetic project (random-extractor, tiny) but replaces the index
payload with a large on-device database (--rows x --dim, generated with
jax.random directly on the chip, no host transfer) so the search side is
production-shaped while ingest stays instant.

    python scripts/bench_serve_load.py [--rows 1000000] [--dim 512]
        [--clients 16] [--requests 256] [--feature-id mlfoundations/...]

Prints one JSON line per mode: requests/s, p50/p95 latency, dispatch stats.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def drive(base: str, n_requests: int, clients: int, end: int):
    """Closed-loop client pool; returns (elapsed_s, latencies)."""
    lat = []
    mu = threading.Lock()

    def one(i):
        t0 = time.perf_counter()
        with urllib.request.urlopen(
            f"{base}/search?q=object+number+{i % 23}&end={end}", timeout=120
        ) as r:
            json.loads(r.read())
        dt = time.perf_counter() - t0
        with mu:
            lat.append(dt)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(clients) as pool:
        list(pool.map(one, range(n_requests)))
    return time.perf_counter() - t0, sorted(lat)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--end", type=int, default=20)
    p.add_argument("--feature-id", default=None,
                   help="real tower id (needs $WISE_CHECKPOINT_DIR); "
                        "default: random extractor at --dim")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (for plumbing checks only; "
                        "numbers are meaningless off-TPU)")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from media_fixtures import make_video
    from wise_tpu.api.server import create_server
    from wise_tpu.cli.create_index import main as create_index_main
    from wise_tpu.pipeline import extract_features

    import tempfile

    root = Path(tempfile.mkdtemp(prefix="serve_load_"))
    media = root / "media"
    media.mkdir(parents=True)
    for i in range(2):
        make_video(media / f"v{i}.mp4", seconds=4, fps=10)
    fid = args.feature_id or f"wise/random_features/{args.dim}/load"
    pdir = root / "proj"
    extract_features([media], pdir, image_feature_id=fid,
                     video_feature_id=fid, audio_feature_id=fid)
    create_index_main(["--project-dir", str(pdir)])

    srv = create_server(str(pdir), hostname="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/proj"
    engine = srv.RequestHandlerClass.engine

    # swap in a production-sized device database: the index keeps its id
    # mapping (ids cycle over the real vectors) but scans (rows, dim)
    index = engine.indices["video"]
    from wise_tpu.ops.topk import _round_up

    n_pad = _round_up(args.rows, index.GROUP)
    db = jax.random.normal(
        jax.random.PRNGKey(0), (n_pad, args.dim), jnp.float32
    )
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    db = jnp.where(
        (jnp.arange(n_pad) < args.rows)[:, None], db, 0.0
    ).astype(jnp.float32)
    index._device_db = db
    index._metadata["count"] = args.rows
    real_ids = np.asarray(index._arrays["ids"])
    index._arrays = dict(index._arrays)
    # cycle over the ACTUAL ids (they may be non-contiguous) so every hit
    # hydrates a real metadata row
    index._arrays["ids"] = real_ids[
        np.arange(args.rows, dtype=np.int64) % len(real_ids)
    ]
    np.asarray(jnp.sum(db[:1]))  # materialise before timing

    # compile the exact graphs both modes will hit (staggered warmup
    # requests may never form a full batch, leaving the padded-batch graph
    # to compile inside the timed window)
    from wise_tpu.api.coalesce import bucket_k

    cap = engine.config.serve.coalesce_max_batch
    q = 1
    while q <= cap:
        index.search_batch(np.zeros((q, args.dim), np.float32),
                           bucket_k(args.end))
        q <<= 1

    results = {}
    for mode in ("coalesced", "uncoalesced"):
        engine.config.serve.coalesce = mode == "coalesced"
        # warmup the full request path (sqlite, thumbs, response assembly)
        drive(base, max(args.clients * 2, 8), args.clients, args.end)
        t, lat = drive(base, args.requests, args.clients, args.end)
        results[mode] = {
            "mode": mode,
            "rows": args.rows,
            "dim": args.dim,
            "clients": args.clients,
            "requests": args.requests,
            "qps": round(args.requests / t, 1),
            "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
            "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 1),
            "coalesce_stats": engine.coalesce_stats(),
        }
        print(json.dumps(results[mode]))
    srv.shutdown()
    if results["uncoalesced"]["qps"] > 0:
        print(json.dumps({
            "speedup_qps": round(
                results["coalesced"]["qps"]
                / results["uncoalesced"]["qps"], 2,
            ),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
