"""On-device IVF search: coarse probe + per-cell slices + top-k, one jit.

The SURVEY target for the faiss-IVF replacement is "k-means (JAX) +
cell-gathered scan honouring the same nlist/nprobe heuristics" — this is
that scan. Cells are stored contiguously (vectors sorted by cell at build),
so each probed cell is ONE contiguous range: the kernel scans the probed
cells, DMA-ing one (lmax, D) slice per cell (contiguous slices stream at
HBM bandwidth; a strided row gather lowers ~10x slower on TPU — same
finding as ops/ivfpq.py), scores it with an MXU matvec, and merges into a
running top-k carry. HBM traffic ~ nprobe * lmax * D, i.e. nprobe/nlist of
the flat scan.

Tie-break: probed cells are re-sorted ascending and rows within cells are
ascending by construction, so the running-top-k concat keeps lower global
rows first and equal scores prefer the lower row id (faiss semantics).

The last cell of an unpadded array may start within lmax rows of the end;
its slice start is clamped and the lane mask shifted so out-of-bounds rows
are never scored.
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
    lmax = min(lmax, db.shape[0])
    d = db.shape[1]

    cscores = jax.lax.dot_general(
        q, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (Q, nlist)
    _, cells = jax.lax.top_k(cscores, nprobe)           # (Q, nprobe)
    cells = jnp.sort(cells, axis=1)                     # ascending -> row order

    lane = jnp.arange(lmax, dtype=jnp.int32)
    n_rows = db.shape[0]

    def one_query(q_i, cells_q):
        def step(carry, c):
            best_v, best_r = carry
            start = cell_offsets[c]
            length = cell_offsets[c + 1] - start
            start_c = jnp.minimum(start, n_rows - lmax)  # clamp near the end
            sl = jax.lax.dynamic_slice(db, (start_c, 0), (lmax, d))
            s = jax.lax.dot_general(
                sl.astype(jnp.float32), q_i,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            rows = start_c + lane
            s = jnp.where((rows >= start) & (rows < start + length), s,
                          -jnp.inf)
            cat_v = jnp.concatenate([best_v, s])
            cat_r = jnp.concatenate([best_r, rows])
            v, pos = jax.lax.top_k(cat_v, best_v.shape[0])
            return (v, cat_r[pos]), None

        k_eff = min(k, nprobe * lmax)
        init = (
            jnp.full((k_eff,), -jnp.inf, jnp.float32),
            jnp.zeros((k_eff,), jnp.int32),
        )
        (v, r), _ = jax.lax.scan(step, init, cells_q)
        return v, r

    return jax.vmap(one_query)(q, cells)
