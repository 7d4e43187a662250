#!/usr/bin/env python
"""Large-k batched top-k variants at the EpicKitchens geometry (round 5).

The measured 607-677 q/s batched-query number is SORT-bound: at k=1000
the hier scan's per-group `lax.top_k(1000)` over 245 groups costs ~200x
the pure matmul+bandwidth floor (8 sweeps of a 3 GB DB ≈ 28 ms total).
This probes the two candidate levers, scan-only (embed contributes only
~0.2 s of the 6.3 s total), interleaved in one session:

  hier g=4096   — the production exact path (baseline);
  hier g=16384  — same algorithm, 4x fewer groups => 4x smaller second-
                  stage candidate set (61k vs 245k rows);
  approx_max_k  — the TPU PartialReduce-backed approximate top-k, with
                  MEASURED per-query recall vs the exact rows. Honest
                  comparator: the reference's own 0.31 s/query batch row
                  is IndexIVFFlat, i.e. approximate too.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wise_tpu.ops.topk import hier_topk  # noqa: E402

N, D, K, Q = 1_000_000, 768, 1000, 512
GROUP_BIG = 16384


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    n_pad = ((N + GROUP_BIG - 1) // GROUP_BIG) * GROUP_BIG

    @jax.jit
    def build(key):
        db = jax.random.normal(key, (N, D), jnp.float32)
        db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
        q = jax.random.normal(jax.random.PRNGKey(9), (Q, D), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        return jnp.pad(db, ((0, n_pad - N), (0, 0))), q

    db, q = build(jax.random.PRNGKey(1))
    np.asarray(db[0, :1])

    variants = {}

    def scan_g(group):
        return jax.jit(
            lambda qq, dd: hier_topk(qq, dd, n_valid=N, k=K, group=group)
        )

    variants["hier_g4096"] = scan_g(4096)
    variants["hier_g16384"] = scan_g(GROUP_BIG)

    def make_approx(recall_target):
        @jax.jit
        def scan_approx(qq, dd):
            s = jax.lax.dot_general(
                qq, dd, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            s = jnp.where(row < N, s, -jnp.inf)
            return jax.lax.approx_max_k(s, K, recall_target=recall_target)
        return scan_approx

    variants["approx_r95"] = make_approx(0.95)

    results = {}
    exact_rows = None
    for name, fn in variants.items():
        t0 = time.perf_counter()
        v, r = fn(q, db)
        np.asarray(v[0, 0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(q, db)
            np.asarray(out[0][0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = (best, np.asarray(r))
        if name == "hier_g4096":
            exact_rows = np.asarray(r)
        qps = Q / best
        print(f"{name}: {best * 1e3:.1f} ms/{Q} queries = {qps:.0f} q/s "
              "(scan only)")

    # exactness / recall vs the g4096 baseline
    for name, (_, rows) in results.items():
        if name == "hier_g4096":
            continue
        hits = np.fromiter(
            (len(np.intersect1d(rows[i], exact_rows[i]))
             for i in range(0, Q, 16)),
            dtype=np.int64,
        )
        recall = hits.mean() / K
        print(f"{name}: recall@{K} vs exact = {recall:.4f}")


if __name__ == "__main__":
    main()
