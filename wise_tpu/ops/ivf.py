"""On-device IVF search: coarse probe + padded cell gather + top-k, one jit.

The SURVEY target for the faiss-IVF replacement is "k-means (JAX) +
cell-gathered scan honouring the same nlist/nprobe heuristics" — this is
that scan. Cells are stored contiguously (vectors sorted by cell at build),
so the probed candidate set is nprobe contiguous ranges; with ranges padded
to the corpus' max cell size the whole search is static-shaped and runs as
one compiled program: centroid matmul -> top-nprobe cells -> row gather ->
candidate matmul -> top-k. HBM traffic ~ nprobe * Lmax * D, i.e. nprobe/nlist
of the flat scan.

Tie-break: probed cells are re-sorted ascending, and rows within cells are
ascending by construction, so candidate order == global row order and equal
scores prefer the lower row id (faiss semantics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("nprobe", "lmax", "k")
)
def ivf_search(
    queries: jax.Array,        # (Q, D) f32
    centroids: jax.Array,      # (nlist, D) f32
    cell_offsets: jax.Array,   # (nlist + 1,) int32 into db rows
    db: jax.Array,             # (N_pad, D) cell-sorted, f32 or bf16
    nprobe: int,
    lmax: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (Q, k), global_row_indices (Q, k)); rows beyond a
    cell's length never appear (masked -inf)."""
    q = queries.astype(jnp.float32)
    nlist = centroids.shape[0]
    nprobe = min(nprobe, nlist)

    cscores = jax.lax.dot_general(
        q, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (Q, nlist)
    _, cells = jax.lax.top_k(cscores, nprobe)           # (Q, nprobe)
    cells = jnp.sort(cells, axis=1)                     # ascending -> row order

    starts = cell_offsets[cells]                        # (Q, nprobe)
    lens = cell_offsets[cells + 1] - starts
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lmax), 2)
    rows = starts[:, :, None] + lane                    # (Q, nprobe, lmax)
    valid = lane < lens[:, :, None]
    rows_safe = jnp.clip(rows, 0, db.shape[0] - 1)

    cand = db[rows_safe.reshape(q.shape[0], -1)]        # (Q, P, D)
    cand = cand.astype(jnp.float32)
    scores = jnp.einsum(
        "qd,qpd->qp", q, cand, precision=jax.lax.Precision.HIGHEST
    )
    scores = jnp.where(valid.reshape(q.shape[0], -1), scores, -jnp.inf)
    k_eff = min(k, scores.shape[1])
    top_v, pos = jax.lax.top_k(scores, k_eff)
    top_rows = jnp.take_along_axis(
        rows_safe.reshape(q.shape[0], -1), pos, axis=1
    )
    return top_v, top_rows
