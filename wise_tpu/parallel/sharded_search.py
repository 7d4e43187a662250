"""Multi-chip sharded inner-product top-k.

The database rows are sharded over the mesh 'dp' axis (each chip holds an
HBM-resident shard). Each chip runs one fused matmul + top_k over its shard,
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


def _shard_body(q, db_shard, n_total, k: int, axis: str):
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
    return _merge_gathered_topk(vals, idx, k, axis)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "n_total"))
def _sharded_scan(mesh: Mesh, q, db, n_total: int, k: int):
    from jax import shard_map

    body = functools.partial(_shard_body, n_total=n_total, k=k, axis="dp")
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
) -> Tuple[np.ndarray, np.ndarray]:
    """queries (Q,D) replicated; db_sharded (N_pad, D) with rows sharded over
    'dp' (N_pad a multiple of mesh dp size; rows >= n_total are padding).
    Returns host numpy (scores, global_row_indices)."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    k_eff = min(k, n_total)
    vals, idx = _sharded_scan(mesh, q, db_sharded, int(n_total), int(k_eff))
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


def _ivf_paged_shard_body(q, centroids, page_first, page_count, paged_db,
                          page_rows, *, nprobe: int, budget: int, chunk: int,
                          k: int, axis: str):
    """Per-chip IVF-Flat under shard_map: each chip runs the SAME paged
    kernel as the single-chip path (ops/ivf_paged.py paged_flat_core) on
    its own contiguous cell-partition — one contiguous page-gather + MXU
    matmul per chunk, no lmax-padded strided row gathers. page_rows carry
    global row ids, so candidates merge over ICI with no re-indexing; a
    cell this chip doesn't own has page_count 0 and contributes nothing."""
    from ..ops.ivf_paged import paged_flat_core

    vals, rows = paged_flat_core(
        q.astype(jnp.float32), centroids,
        page_first[0], page_count[0], paged_db, page_rows,
        nprobe=nprobe, budget=budget, chunk=chunk, k=k,
    )
    return _merge_gathered_topk(vals, rows, k, axis)


def _ivfpq_paged_shard_body(q, centroids, page_first, page_count,
                            paged_codes, page_rows, codebooks, *,
                            nprobe: int, budget: int, chunk: int, k: int,
                            axis: str):
    """Per-chip IVF-PQ ADC under shard_map — the single-chip paged one-hot
    ADC kernel (ops/ivf_paged.py paged_pq_core) per cell-partition."""
    from ..ops.ivf_paged import paged_pq_core

    vals, rows = paged_pq_core(
        q.astype(jnp.float32), centroids,
        page_first[0], page_count[0], paged_codes, page_rows, codebooks,
        nprobe=nprobe, budget=budget, chunk=chunk, k=k,
    )
    return _merge_gathered_topk(vals, rows, k, axis)


@functools.partial(
    jax.jit, static_argnames=("mesh", "nprobe", "budget", "chunk", "k")
)
def _sharded_ivf(mesh, q, centroids, page_first, page_count, paged_db,
                 page_rows, nprobe, budget, chunk, k):
    from jax import shard_map

    body = functools.partial(
        _ivf_paged_shard_body, nprobe=nprobe, budget=budget, chunk=chunk,
        k=k, axis="dp",
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("dp", None), P("dp", None),
                  P("dp", None, None), P("dp", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, centroids, page_first, page_count, paged_db, page_rows)


@functools.partial(
    jax.jit, static_argnames=("mesh", "nprobe", "budget", "chunk", "k")
)
def _sharded_ivfpq(mesh, q, centroids, page_first, page_count, paged_codes,
                   page_rows, codebooks, nprobe, budget, chunk, k):
    from jax import shard_map

    body = functools.partial(
        _ivfpq_paged_shard_body, nprobe=nprobe, budget=budget, chunk=chunk,
        k=k, axis="dp",
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("dp", None), P("dp", None),
                  P("dp", None, None), P("dp", None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, centroids, page_first, page_count, paged_codes, page_rows,
      codebooks)


def build_sharded_paged(mesh: Mesh, data, cell_offsets, lpad: int,
                        cast_bf16: bool = False) -> dict:
    """Host cell-sorted rows/codes + offsets -> device-resident paged
    shards, cell-partitioned over 'dp' (build_paged_layout ->
    shard_paged_layout -> shard_paged_to_device)."""
    from ..ops.ivf_paged import build_paged_layout, shard_paged_layout

    lay = build_paged_layout(np.asarray(data), np.asarray(cell_offsets),
                             lpad)
    sh = shard_paged_layout(lay, mesh.shape["dp"])
    return shard_paged_to_device(mesh, sh, cast_bf16=cast_bf16)


def sharded_paged_plan(pg: dict, nprobe: int, dim: int, nq: int = 1):
    """Static (budget, chunk) shared by every chip: budget is the worst
    chip's worst case (one static value for SPMD)."""
    from ..ops.ivf_paged import default_chunk, paged_budget

    budget = max(paged_budget(row, nprobe) for row in pg["page_count_host"])
    lpad = pg["paged"].shape[1]
    return budget, default_chunk(lpad, int(dim), budget, nq=nq)


def shard_paged_to_device(mesh: Mesh, sharded_layout: dict,
                          cast_bf16: bool = False) -> dict:
    """device_put a shard_paged_layout result with pages/first/count/rows
    sharded over 'dp' (centroid-replicated arrays are the caller's)."""
    sh = lambda *axes: NamedSharding(mesh, P(*axes))  # noqa: E731
    out = {
        "paged": jax.device_put(
            sharded_layout["paged"], sh("dp", None, None)
        ),
        "page_rows": jax.device_put(
            sharded_layout["page_rows"], sh("dp", None)
        ),
        "page_first": jax.device_put(
            sharded_layout["page_first"], sh("dp", None)
        ),
        "page_count": jax.device_put(
            sharded_layout["page_count"], sh("dp", None)
        ),
        "page_count_host": sharded_layout["page_count_host"],
    }
    if cast_bf16:
        out["paged"] = jax.jit(
            lambda x: x.astype(jnp.bfloat16),
            out_shardings=sh("dp", None, None),
        )(out["paged"])
    return out


def sharded_ivf_paged_topk(mesh, queries, centroids, pg: dict, nprobe: int,
                           k: int, chunk: int, budget: int):
    """Multi-chip paged IVF-Flat: ``pg`` from shard_paged_to_device.
    Returns host (scores, global cell-sorted rows)."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    vals, idx = _sharded_ivf(
        mesh, q, centroids, pg["page_first"], pg["page_count"],
        pg["paged"], pg["page_rows"],
        int(nprobe), int(budget), int(chunk), int(k),
    )
    return np.asarray(vals), np.asarray(idx)


def sharded_ivfpq_paged_topk(mesh, queries, centroids, pg: dict, codebooks,
                             nprobe: int, k: int, chunk: int, budget: int):
    """Multi-chip paged IVF-PQ ADC over cell-partitioned uint8 code pages."""
    q = jnp.asarray(queries, dtype=jnp.float32)
    vals, idx = _sharded_ivfpq(
        mesh, q, centroids, pg["page_first"], pg["page_count"],
        pg["paged"], pg["page_rows"], codebooks,
        int(nprobe), int(budget), int(chunk), int(k),
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
