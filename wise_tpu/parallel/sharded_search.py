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
