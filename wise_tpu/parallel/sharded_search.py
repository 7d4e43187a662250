"""Multi-chip sharded inner-product top-k.

The database rows are sharded over the mesh 'dp' axis (each chip holds an
HBM-resident shard). Each chip runs the streaming block scan on its shard,
then per-shard top-k candidates are all-gathered over ICI and merged — the
TPU-native equivalent of faiss's single-node OpenMP scan (see SURVEY.md §2b).

Communication cost per query batch: all_gather of (ndev, Q, k) scores+ids —
tiny compared to the HBM scan, so scaling is essentially linear in chips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import scan_topk


def _shard_body(q, db_shard, n_total, k: int, block_rows: int, axis: str):
    """Runs per-chip under shard_map; db_shard is this chip's rows. One fused
    matmul + top_k over the shard (HBM-bandwidth-bound; the merge across
    chips happens on the gathered (ndev, Q, k) candidates)."""
    shard_rows = db_shard.shape[0]
    my = jax.lax.axis_index(axis)
    # rows >= n_total are zero padding and must be masked BEFORE the local
    # top-k (their score 0 would beat negative true scores)
    local_valid = n_total - my * shard_rows
    if db_shard.dtype == jnp.bfloat16:
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), db_shard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jax.lax.dot_general(
            q.astype(jnp.float32), db_shard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    col = jax.lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    scores = jnp.where(col < local_valid, scores, -jnp.inf)
    k_local = min(k, shard_rows)
    vals, idx = jax.lax.top_k(scores, k_local)
    idx = idx + my * shard_rows  # local row -> global row
    all_vals = jax.lax.all_gather(vals, axis)  # (ndev, Q, k)
    all_idx = jax.lax.all_gather(idx, axis)
    ndev = all_vals.shape[0]
    q_n = all_vals.shape[1]
    flat_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q_n, ndev * k_local)
    flat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q_n, ndev * k_local)
    # sort ties by (score desc, global index asc): top_k prefers first
    # occurrence, so pre-sort each row by index via stable ordering trick:
    # shards are concatenated in device order == ascending global index, so
    # first occurrence already is the lowest index.
    top_vals, pos = jax.lax.top_k(flat_vals, k)
    top_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    return top_vals, top_idx


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "block_rows", "n_total")
)
def _sharded_scan(mesh: Mesh, q, db, n_total: int, k: int, block_rows: int):
    from jax import shard_map

    body = functools.partial(
        _shard_body, n_total=n_total, k=k, block_rows=block_rows, axis="dp"
    )
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("dp", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, db)


def sharded_scan_topk(
    mesh: Mesh,
    queries,
    db_sharded,
    n_total: int,
    k: int,
    block_rows: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """queries (Q,D) replicated; db_sharded (N_pad, D) with rows sharded over
    'dp' (N_pad a multiple of mesh dp size; rows >= n_total are padding).
    Returns host numpy (scores, global_row_indices)."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    ndev = mesh.shape["dp"]
    k_eff = min(k, n_total)
    vals, idx = _sharded_scan(
        mesh, q, db_sharded, int(n_total), int(k_eff), int(block_rows)
    )
    return np.asarray(vals), np.asarray(idx)


def _int8_shard_body(q, codes_shard, scales_shard, n_total, kc: int,
                     axis: str):
    """Per-chip int8 candidate scan (ops/topk.py int8_candidates semantics,
    row-sharded): symmetric-quantized dot on the chip's code rows, per-row
    rescale, local top-kc, ICI merge. The caller re-scores the merged
    candidates in f32 on the host (exact-rerank contract)."""
    shard_rows = codes_shard.shape[0]
    my = jax.lax.axis_index(axis)
    local_valid = n_total - my * shard_rows
    q = q.astype(jnp.float32)
    q_scale = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0
    q_i8 = jnp.rint(q / jnp.where(q_scale == 0, 1, q_scale)).astype(jnp.int8)
    raw = jax.lax.dot_general(
        q_i8, codes_shard,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * (q_scale * scales_shard[None, :])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    scores = jnp.where(col < local_valid, scores, -jnp.inf)
    kc_local = min(kc, shard_rows)
    vals, idx = jax.lax.top_k(scores, kc_local)
    idx = idx + my * shard_rows
    return _merge_gathered_topk(vals, idx, kc, axis)


@functools.partial(jax.jit, static_argnames=("mesh", "kc", "n_total"))
def _sharded_int8(mesh, q, codes, scales, n_total, kc):
    from jax import shard_map

    body = functools.partial(
        _int8_shard_body, n_total=n_total, kc=kc, axis="dp"
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("dp", None), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, codes, scales)


def sharded_int8_candidates(mesh, queries, codes_sharded, scales_sharded,
                            n_total: int, kc: int):
    """queries (Q, D) replicated; codes (N_pad, D) int8 + scales (N_pad,)
    row-sharded over 'dp'. Returns host (approx scores, global rows) of the
    top-kc candidates for exact f32 rerank."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    kc = min(kc, n_total)
    vals, idx = _sharded_int8(
        mesh, q, codes_sharded, scales_sharded, int(n_total), int(kc)
    )
    return np.asarray(vals), np.asarray(idx)


def _merge_gathered_topk(vals, idx, k: int, axis: str):
    """all_gather per-chip (Q, k_local) candidates and take the global top-k.
    Chip shards hold ascending global row ranges and each chip emits its
    candidates in ascending-row order, so the flattened chip-major order is
    ascending global row and lax.top_k's first-occurrence tie-break prefers
    the lower row id (faiss semantics)."""
    all_vals = jax.lax.all_gather(vals, axis)   # (ndev, Q, k_local)
    all_idx = jax.lax.all_gather(idx, axis)
    ndev, q_n, k_local = all_vals.shape
    flat_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q_n, ndev * k_local)
    flat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q_n, ndev * k_local)
    top_vals, pos = jax.lax.top_k(flat_vals, min(k, ndev * k_local))
    return top_vals, jnp.take_along_axis(flat_idx, pos, axis=1)


def _ivf_probe_rows(q, centroids, cell_offsets, nprobe: int, lmax: int):
    """Replicated coarse probe: top-nprobe cells (re-sorted ascending) ->
    (global candidate rows (Q, nprobe*lmax), lane-validity mask, per-row
    coarse score (Q, nprobe*lmax))."""
    cscores = jax.lax.dot_general(
        q, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    probe_scores, cells = jax.lax.top_k(cscores, nprobe)
    order = jnp.argsort(cells, axis=1)
    cells = jnp.take_along_axis(cells, order, axis=1)
    probe_scores = jnp.take_along_axis(probe_scores, order, axis=1)
    starts = cell_offsets[cells]
    lens = cell_offsets[cells + 1] - starts
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lmax), 2)
    rows = starts[:, :, None] + lane                      # (Q, nprobe, lmax)
    valid = lane < lens[:, :, None]
    nq = q.shape[0]
    return (
        rows.reshape(nq, -1),
        valid.reshape(nq, -1),
        jnp.repeat(probe_scores, lmax, axis=1),
    )


def _ivf_shard_body(q, centroids, cell_offsets, db_shard, *, nprobe: int,
                    lmax: int, k: int, axis: str):
    """Per-chip IVF-Flat search under shard_map: probe is replicated work
    (tiny); each chip gathers/scores only the intersection of the probed
    ranges with its own contiguous global row range."""
    q = q.astype(jnp.float32)
    shard_rows = db_shard.shape[0]
    my = jax.lax.axis_index(axis)
    base = my * shard_rows
    rows, valid, _ = _ivf_probe_rows(q, centroids, cell_offsets, nprobe, lmax)
    mine = valid & (rows >= base) & (rows < base + shard_rows)
    local = jnp.clip(rows - base, 0, shard_rows - 1)
    cand = db_shard[local].astype(jnp.float32)            # (Q, P, D)
    scores = jnp.einsum(
        "qd,qpd->qp", q, cand, precision=jax.lax.Precision.HIGHEST
    )
    scores = jnp.where(mine, scores, -jnp.inf)
    k_local = min(k, scores.shape[1])
    vals, pos = jax.lax.top_k(scores, k_local)
    gidx = jnp.take_along_axis(rows, pos, axis=1)
    return _merge_gathered_topk(vals, gidx, k, axis)


def _ivfpq_shard_body(q, centroids, cell_offsets, codebooks, codes_shard, *,
                      nprobe: int, lmax: int, k: int, axis: str):
    """Per-chip IVF-PQ ADC under shard_map (uint8 codes row-sharded)."""
    q = q.astype(jnp.float32)
    nq = q.shape[0]
    m, ksub, dsub = codebooks.shape
    shard_rows = codes_shard.shape[0]
    my = jax.lax.axis_index(axis)
    base = my * shard_rows
    rows, valid, probe_scores = _ivf_probe_rows(
        q, centroids, cell_offsets, nprobe, lmax
    )
    mine = valid & (rows >= base) & (rows < base + shard_rows)
    local = jnp.clip(rows - base, 0, shard_rows - 1)
    tables = jnp.einsum(
        "qmd,mkd->qmk", q.reshape(nq, m, dsub),
        codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(nq, m * ksub)
    cand = codes_shard[local].astype(jnp.int32)           # (Q, P, M)
    flat_idx = cand + jnp.arange(m, dtype=jnp.int32) * ksub
    lut = jnp.take_along_axis(tables[:, None, :], flat_idx, axis=2)
    scores = jnp.sum(lut, axis=2) + probe_scores
    scores = jnp.where(mine, scores, -jnp.inf)
    k_local = min(k, scores.shape[1])
    vals, pos = jax.lax.top_k(scores, k_local)
    gidx = jnp.take_along_axis(rows, pos, axis=1)
    return _merge_gathered_topk(vals, gidx, k, axis)


@functools.partial(
    jax.jit, static_argnames=("mesh", "nprobe", "lmax", "k")
)
def _sharded_ivf(mesh, q, centroids, cell_offsets, db, nprobe, lmax, k):
    from jax import shard_map

    body = functools.partial(
        _ivf_shard_body, nprobe=nprobe, lmax=lmax, k=k, axis="dp"
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, centroids, cell_offsets, db)


@functools.partial(
    jax.jit, static_argnames=("mesh", "nprobe", "lmax", "k")
)
def _sharded_ivfpq(mesh, q, centroids, cell_offsets, codebooks, codes,
                   nprobe, lmax, k):
    from jax import shard_map

    body = functools.partial(
        _ivfpq_shard_body, nprobe=nprobe, lmax=lmax, k=k, axis="dp"
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("dp", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, centroids, cell_offsets, codebooks, codes)


def sharded_ivf_topk(mesh, queries, centroids, cell_offsets, db_sharded,
                     nprobe: int, lmax: int, k: int):
    """Multi-chip IVF-Flat: centroids/offsets replicated, cell-sorted rows
    sharded over 'dp' (pad_and_shard_db). Returns host (scores, rows)."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    vals, idx = _sharded_ivf(
        mesh, q, centroids, cell_offsets, db_sharded,
        int(nprobe), int(lmax), int(k),
    )
    return np.asarray(vals), np.asarray(idx)


def sharded_ivfpq_topk(mesh, queries, centroids, cell_offsets, codebooks,
                       codes_sharded, nprobe: int, lmax: int, k: int):
    """Multi-chip IVF-PQ ADC over row-sharded uint8 codes."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    vals, idx = _sharded_ivfpq(
        mesh, q, centroids, cell_offsets, codebooks, codes_sharded,
        int(nprobe), int(lmax), int(k),
    )
    return np.asarray(vals), np.asarray(idx)


def pad_and_shard_db(mesh: Mesh, db: np.ndarray):
    """Pad rows to a multiple of the dp size and device_put with rows sharded
    over 'dp'. Returns (sharded_array, n_total)."""
    ndev = mesh.shape["dp"]
    n = db.shape[0]
    n_pad = ((n + ndev - 1) // ndev) * ndev
    if n_pad != n:
        db = np.concatenate(
            [db, np.zeros((n_pad - n, db.shape[1]), dtype=db.dtype)], axis=0
        )
    arr = jax.device_put(db, NamedSharding(mesh, P("dp", None)))
    return arr, n
