"""On-device IVF-PQ search: coarse probe + per-cell slices + ADC, one jit.

Device-side counterpart of the host ADC loop (index/feature_index.py
_search_ivfpq_host, mirroring the reference's faiss IndexIVFPQ usage in
src/index/feature_search_index.py). The whole search compiles to a single
XLA program:

  centroid matmul -> top-nprobe cells -> scan over probed cells, each step
  DMA-ing ONE contiguous (lmax, M) uint8 code slice (cells are stored
  contiguously; a strided row gather of 8-byte rows is ~10x slower on TPU),
  decoding residuals through 64-wide codebook gathers (books live in VMEM),
  scoring with an (lmax, D) x (D,) MXU matvec, and merging into a running
  top-k carry -> final (Q, k).

Score = q . cell_centroid + q . decoded_residual — algebraically identical
to the classic LUT-sum ADC (sum_m LUT[m, code_m] == q . concat_m
books[m][code_m]) but expressed as wide gathers + matmuls instead of
lmax*M scalar LUT lookups, which the TPU vector unit handles poorly.
Measured at 1M x 512 (nlist 1024, M 8, k 100) on v5e: ~0.1 ms/query at
nprobe=8 and 3.2 ms at nprobe=64 vs 0.51/4.55 ms for the flat-gather
LUT formulation.

Tie-break matches ops/ivf.py: cells are processed in ascending order and
lanes ascend within a cell, so the running-top-k concat keeps lower global
rows first and lax.top_k's first-occurrence preference yields faiss
ordering (equal scores -> lower row id).

The last cell of an unpadded codes array may start within lmax rows of the
end; its slice start is clamped and the lane mask shifted so no
out-of-bounds rows are ever scored.
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
    lmax = min(lmax, codes.shape[0])
    books = codebooks.astype(jnp.float32)

    cscores = jax.lax.dot_general(
        q, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (Q, nlist)
    probe_scores, cells = jax.lax.top_k(cscores, nprobe)
    order = jnp.argsort(cells, axis=1)                  # ascending -> row order
    cells = jnp.take_along_axis(cells, order, axis=1)
    probe_scores = jnp.take_along_axis(probe_scores, order, axis=1)

    marange = jnp.arange(m)
    lane = jnp.arange(lmax, dtype=jnp.int32)
    n_rows = codes.shape[0]

    def one_query(q_i, cells_q, pscores_q):
        def step(carry, inp):
            best_v, best_r = carry
            c, ps = inp
            start = cell_offsets[c]
            length = cell_offsets[c + 1] - start
            start_c = jnp.minimum(start, n_rows - lmax)  # clamp near the end
            sl = jax.lax.dynamic_slice(codes, (start_c, 0), (lmax, m))
            dec = books[marange[None, :], sl.astype(jnp.int32)]
            s = jax.lax.dot_general(
                dec.reshape(lmax, m * dsub), q_i,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGH,  # bf16x3: f32-accurate,
            ) + ps                                 # ~2x the HIGHEST matvec
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
        (v, r), _ = jax.lax.scan(step, init, (cells_q, pscores_q))
        return v, r

    return jax.vmap(one_query)(q, cells, probe_scores)
