"""On-device IVF-PQ search: coarse probe + code gather + ADC, one jit.

Device-side counterpart of the host ADC loop (index/feature_index.py
_search_ivfpq_host, mirroring the reference's faiss IndexIVFPQ usage in
src/index/feature_search_index.py). The whole search compiles to a single
XLA program:

  centroid matmul -> top-nprobe cells -> padded code gather (uint8 rows
  stay uint8 in HBM: M bytes/vector, 4*D/M x less traffic than the flat
  scan) -> per-query (M, ksub) ADC tables from ONE einsum on the MXU ->
  LUT-sum via a broadcast take_along_axis over the flattened tables ->
  masked top-k.

Score = q . cell_centroid + sum_m LUT[m, code_m]  (asymmetric distance on
residual-encoded codes, identical to the host path). The ADC tables are
tiny (M * ksub floats) and live in VMEM; the gather is the only
non-matmul op and touches nprobe * lmax * M bytes of codes.

Tie-break matches ops/ivf.py: probed cells re-sorted ascending and rows
ascending within cells, so equal scores prefer the lower row id.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nprobe", "lmax", "k"))
def ivfpq_search(
    queries: jax.Array,        # (Q, D) f32
    centroids: jax.Array,      # (nlist, D) f32
    cell_offsets: jax.Array,   # (nlist + 1,) int32 into code rows
    codes: jax.Array,          # (N, M) uint8, cell-sorted
    codebooks: jax.Array,      # (M, ksub, D/M) f32
    nprobe: int,
    lmax: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores (Q, k), global_row_indices (Q, k)); rows beyond a
    cell's length never appear (masked -inf)."""
    q = queries.astype(jnp.float32)
    nq, d = q.shape
    nlist = centroids.shape[0]
    m, ksub, dsub = codebooks.shape
    nprobe = min(nprobe, nlist)

    cscores = jax.lax.dot_general(
        q, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (Q, nlist)
    probe_scores, cells = jax.lax.top_k(cscores, nprobe)
    order = jnp.argsort(cells, axis=1)                  # ascending -> row order
    cells = jnp.take_along_axis(cells, order, axis=1)
    probe_scores = jnp.take_along_axis(probe_scores, order, axis=1)

    starts = cell_offsets[cells]                        # (Q, nprobe)
    lens = cell_offsets[cells + 1] - starts
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lmax), 2)
    rows = starts[:, :, None] + lane                    # (Q, nprobe, lmax)
    valid = lane < lens[:, :, None]
    rows_safe = jnp.clip(rows, 0, codes.shape[0] - 1).reshape(nq, -1)

    # per-query ADC tables, flattened to (Q, M*ksub) for a single gather
    tables = jnp.einsum(
        "qmd,mkd->qmk", q.reshape(nq, m, dsub),
        codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(nq, m * ksub)

    cand = codes[rows_safe].astype(jnp.int32)           # (Q, P, M)
    flat_idx = cand + jnp.arange(m, dtype=jnp.int32) * ksub
    lut = jnp.take_along_axis(tables[:, None, :], flat_idx, axis=2)
    scores = jnp.sum(lut, axis=2)                       # (Q, P)
    scores = scores + jnp.repeat(probe_scores, lmax, axis=1)
    scores = jnp.where(valid.reshape(nq, -1), scores, -jnp.inf)

    k_eff = min(k, scores.shape[1])
    top_v, pos = jax.lax.top_k(scores, k_eff)
    top_rows = jnp.take_along_axis(rows_safe, pos, axis=1)
    return top_v, top_rows
