#!/usr/bin/env python
"""A/B the exact-scan top-k selection algorithms at SERVING batch shapes.

Coalesced serving (api/coalesce.py) turned batched search into the hot
path: the scan matmul is Q-independent (one HBM sweep), but the selection
stage scales with Q — and the current flat_topk dispatch (two_stage for
Q <= 4, hier above) predates coalescing. This measures two_stage vs hier
vs the scan fallback at Q in {1, 4, 8, 16}, k in {20, 100}, f32 and bf16
storage, back-to-back in one process (CLAUDE.md: interleaved A/B is the
only trustworthy comparison on the tunnel; N-iteration chains, one tiny
readback).

    python scripts/bench_batched_topk.py [--rows 1000000] [--dim 512]
        [--iters 30]

Prints one JSON line per (algo, dtype, Q, k): ms/call and ms/query.
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
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax as _j

        _j.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from wise_tpu.ops.topk import (
        _round_up,
        hier_topk,
        scan_topk,
        two_stage_topk,
    )
    from wise_tpu.utils.profiling import measure_roundtrip

    GROUP = 4096
    n_pad = _round_up(args.rows, GROUP)
    key = jax.random.PRNGKey(0)
    db = jax.random.normal(key, (n_pad, args.dim), jnp.float32)
    db = jnp.where(
        (jnp.arange(n_pad) < args.rows)[:, None], db, 0.0
    )
    db16 = db.astype(jnp.bfloat16)
    np.asarray(jnp.sum(db[:1]))
    roundtrip = measure_roundtrip()
    print(json.dumps({"tunnel_roundtrip_ms": round(roundtrip * 1e3, 1)}))

    algos = {
        "two_stage": lambda q, d: two_stage_topk(
            q, d, n_valid=args.rows, k=K, group=GROUP
        ),
        "hier": lambda q, d: hier_topk(
            q, d, n_valid=args.rows, k=K, group=GROUP
        ),
        "scan": lambda q, d: scan_topk(
            q, d, k=K, block_rows=GROUP, n_valid=args.rows
        ),
    }

    results = []
    for K in (20, 100):
        for qn in (1, 4, 8, 16):
            qs = jax.random.normal(
                jax.random.PRNGKey(qn * 100 + K), (qn, args.dim),
                jnp.float32,
            )
            for dname, d in (("f32", db), ("bf16", db16)):
                for aname, fn in algos.items():
                    if aname == "scan" and (qn > 1 or K > 20):
                        continue  # scan is the streaming reference only
                    # chain iterations through a data dependency so the
                    # host loop can't run ahead; db rides as an ARGUMENT —
                    # a closure capture would embed the 2 GB database as a
                    # lowering constant in every one of the ~36 graphs
                    def step(c, q, db):
                        v, i = fn(q + c * 0, db)
                        return v[0, 0] * 0
                    jstep = jax.jit(step)
                    c = jnp.float32(0)
                    np.asarray(jstep(c, qs, d))  # compile
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        c = jstep(c, qs, d)
                    np.asarray(c)
                    ms = (
                        (time.perf_counter() - t0 - roundtrip)
                        / args.iters * 1e3
                    )
                    rec = {
                        "algo": aname, "dtype": dname, "Q": qn, "k": K,
                        "ms": round(ms, 3),
                        "ms_per_query": round(ms / qn, 3),
                    }
                    results.append(rec)
                    print(json.dumps(rec))
    # correctness cross-check on the last shapes
    v1, i1 = two_stage_topk(qs, db, n_valid=args.rows, k=K, group=GROUP)
    v2, i2 = hier_topk(qs, db, n_valid=args.rows, k=K, group=GROUP)
    assert (np.asarray(i1) == np.asarray(i2)).all(), "algo mismatch"
    print(json.dumps({"parity": "ok"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
