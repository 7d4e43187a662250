"""K-means (Lloyd) in JAX — IVF coarse quantizer training.

Replaces faiss's clustering used by ``IndexIVFFlat.train`` (reference builds
IVF with nlist/train-count heuristics at
/root/reference/src/index/feature_search_index.py:53-76). Assignment is a
blocked matmul (MXU-friendly); centroid update is a segment-sum; empty
clusters are re-seeded from the largest cluster's points, mirroring faiss's
split policy.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("block",))
def _assign(x, centroids, block: int = 8192):
    """x (N,D), centroids (K,D) -> (assignments (N,), sq dists not needed).
    Nearest by L2 == argmax(2 x.c - |c|^2) for fixed x."""
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)  # (K,)

    def blk(xb):
        scores = (
            2.0
            * jax.lax.dot_general(
                xb.astype(jnp.float32),
                centroids.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            - c_sq[None, :]
        )
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    out = jax.lax.map(blk, xp.reshape(-1, block, x.shape[1]))
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def _update(x, assign, k: int):
    x = x.astype(jnp.float32)
    sums = jax.ops.segment_sum(x, assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), assign, k)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return centroids, counts


def kmeans(
    x: np.ndarray, k: int, iters: int = 20, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (centroids (k, D) float32, assignments (N,) int32)."""
    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    if k >= n:
        # degenerate: every point its own centroid (pad by repeating)
        reps = -(-k // n)
        centroids = np.tile(x, (reps, 1))[:k]
        return centroids.astype(np.float32), _np_assign_final(x, centroids)
    rng = np.random.default_rng(seed)
    init_idx = rng.choice(n, size=k, replace=False)
    centroids = jnp.asarray(x[init_idx])
    xj = jnp.asarray(x)
    for _ in range(iters):
        assign = _assign(xj, centroids)
        centroids, counts = _update(xj, assign, k)
        counts_np = np.asarray(counts)
        empty = np.where(counts_np == 0)[0]
        if len(empty):
            # re-seed empty clusters near points of the biggest cluster
            # (np.array: np.asarray of a jax array is a read-only view)
            centroids = np.array(centroids)
            big = int(np.argmax(counts_np))
            donors = np.where(np.asarray(assign) == big)[0]
            pick = rng.choice(donors, size=len(empty), replace=len(donors) < len(empty))
            centroids[empty] = x[pick] + rng.normal(scale=1e-4, size=(len(empty), d))
            centroids = jnp.asarray(centroids)
    assign = np.asarray(_assign(xj, centroids), dtype=np.int32)
    return np.asarray(centroids, dtype=np.float32), assign


def _np_assign_final(x, centroids):
    c_sq = np.sum(centroids**2, axis=1)
    scores = 2.0 * x @ centroids.T - c_sq[None, :]
    return np.argmax(scores, axis=1).astype(np.int32)
