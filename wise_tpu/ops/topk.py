"""Streaming inner-product top-k over an HBM-resident vector database.

TPU-native replacement for faiss ``IndexFlatIP.search`` (reference:
/root/reference/src/index/feature_search_index.py:100-114). The database
never materialises an (N_db, N_q) score matrix: a ``lax.scan`` walks the DB
in MXU-sized row blocks, computes ``q @ block.T`` in float32 (precision
HIGHEST so rankings are reproducible — TPUs default matmuls to bf16), takes
a block-local top-k, and merges it into a running top-k carry. One pass over
HBM -> bandwidth-bound, which is the speed-of-light for this op.

Tie-breaking contract: scores sorted descending; equal scores prefer the
lower row index (matches faiss and keeps multi-chip merges deterministic).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _merge_topk(run_vals, run_idx, new_vals, new_idx, k: int):
    """Merge two (Q, k) top-k sets. Running set comes first in the concat, so
    jnp.lax.top_k's first-occurrence tie-break prefers earlier (lower-index)
    entries."""
    vals = jnp.concatenate([run_vals, new_vals], axis=1)
    idx = jnp.concatenate([run_idx, new_idx], axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_vals, top_idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def scan_topk(
    queries: jax.Array,
    db: jax.Array,
    k: int,
    block_rows: int = 4096,
    n_valid=None,
) -> Tuple[jax.Array, jax.Array]:
    """queries (Q, D), db (N, D) -> (scores (Q, k), row_indices (Q, k)).

    k and block_rows are static. N is padded to a block multiple internally;
    padded rows score -inf and can never appear in results (k must be <= N).
    ``n_valid`` (traced scalar, optional) additionally masks rows >= n_valid
    BEFORE the local top-k — required when the caller's db rows carry
    zero-padding, whose score of 0 would otherwise beat negative true scores.
    """
    q = queries.astype(jnp.float32)
    n, d = db.shape
    k = min(k, n)
    block_rows = min(block_rows, _round_up(n, 8))
    # lax.top_k needs k <= block width
    block_rows = max(block_rows, _round_up(k, 8))
    n_pad = _round_up(n, block_rows)
    num_blocks = n_pad // block_rows

    db_padded = jnp.pad(db, ((0, n_pad - n), (0, 0)))
    blocks = db_padded.reshape(num_blocks, block_rows, d)

    row_in_block = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    def step(carry, xs):
        run_vals, run_idx = carry
        block, block_id = xs
        scores = jax.lax.dot_general(
            q,
            block.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (Q, block_rows)
        global_row = row_in_block + block_id * block_rows
        valid = global_row < n
        if n_valid is not None:
            valid = jnp.logical_and(valid, global_row < n_valid)
        scores = jnp.where(valid, scores, -jnp.inf)
        loc_vals, loc_pos = jax.lax.top_k(scores, k)
        loc_idx = loc_pos + block_id * block_rows
        return _merge_topk(run_vals, run_idx, loc_vals, loc_idx, k), None

    init = (
        jnp.full((q.shape[0], k), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((q.shape[0], k), dtype=jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(
        step, init, (blocks, jnp.arange(num_blocks, dtype=jnp.int32))
    )
    return vals, idx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "group", "n_valid"))
def hier_topk(
    queries: jax.Array,
    db_padded: jax.Array,
    n_valid: int,
    k: int,
    group: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Hierarchical exact top-k: one matmul over the whole (padded) DB, then
    per-group top-k + a final merge. ~2.4x faster than a flat 1M-element
    lax.top_k on TPU because the expensive sort runs on `group`-sized rows in
    parallel instead of one huge row. Exact when k <= group (guaranteed by
    construction: a group can contribute at most `group` of the global top-k).

    db_padded rows must be a multiple of `group`; rows >= n_valid are padding
    and score -inf. Tie-break: equal scores prefer the lower row index
    (group-major candidate order preserves it).
    """
    n_pad = db_padded.shape[0]
    assert n_pad % group == 0, "db rows must be padded to a multiple of group"
    k_eff = min(k, n_valid)

    if db_padded.dtype == jnp.bfloat16:
        # bf16 storage: half the HBM traffic; accumulate f32 on the MXU
        def _scores(q):
            return jax.lax.dot_general(
                q.astype(jnp.bfloat16), db_padded,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        def _scores(q):
            return jax.lax.dot_general(
                q.astype(jnp.float32), db_padded,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )

    if k_eff > group:
        # fall back to the flat sort (rare: very large k)
        scores = _scores(queries)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        scores = jnp.where(row < n_valid, scores, -jnp.inf)
        return jax.lax.top_k(scores, k_eff)

    q = queries
    scores = _scores(q)  # (Q, n_pad)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    n_groups = n_pad // group
    s = scores.reshape(q.shape[0], n_groups, group)
    v, i = jax.lax.top_k(s, k_eff)  # (Q, G, k)
    base = (jnp.arange(n_groups, dtype=jnp.int32) * group)[None, :, None]
    i = i + base
    v = v.reshape(q.shape[0], n_groups * k_eff)
    i = i.reshape(q.shape[0], n_groups * k_eff)
    top_v, pos = jax.lax.top_k(v, k_eff)
    top_i = jnp.take_along_axis(i, pos, axis=1)
    return top_v, top_i


@functools.partial(jax.jit, static_argnames=("k", "group", "n_valid"))
def two_stage_topk(
    queries: jax.Array,
    db_padded: jax.Array,
    n_valid: int,
    k: int,
    group: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via block-max candidate selection.

    Proof of exactness: let t be the k-th largest score. Any block containing
    a top-k element has max >= t; and at most k blocks can have max >= t
    (each block max is itself a score, so > k such blocks would mean > k
    scores >= t). Hence the top-k blocks by max — selected stably — contain
    every top-k element. Only k*group candidate scores are then sorted,
    vs all N in hier_topk's per-group sort: ~2.5 ms vs ~4 ms at 1M x 512 on
    a v5e chip (matmul floor 2.3 ms).

    Tie-break matches faiss (lower row index): candidate blocks are re-ordered
    by ascending block index before the final top-k.
    """
    n_pad = db_padded.shape[0]
    assert n_pad % group == 0
    k_eff = min(k, n_valid)
    num_blocks = n_pad // group
    kb = min(k_eff, num_blocks)

    if db_padded.dtype == jnp.bfloat16:
        scores = jax.lax.dot_general(
            queries.astype(jnp.bfloat16), db_padded,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jax.lax.dot_general(
            queries.astype(jnp.float32), db_padded,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    qn = scores.shape[0]
    blocks = scores.reshape(qn, num_blocks, group)
    block_max = jnp.max(blocks, axis=2)                      # (Q, nb)
    _, blk_idx = jax.lax.top_k(block_max, kb)                # stable
    blk_idx = jnp.sort(blk_idx, axis=1)                      # index order -> faiss ties
    cand = jnp.take_along_axis(blocks, blk_idx[:, :, None], axis=1)
    cand = cand.reshape(qn, kb * group)
    base = (blk_idx * group)[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (qn, kb, group), 2
    )
    base = base.reshape(qn, kb * group)
    top_v, pos = jax.lax.top_k(cand, k_eff)
    top_i = jnp.take_along_axis(base, pos, axis=1)
    return top_v, top_i


def flat_topk(
    queries: jax.Array,
    db_padded: jax.Array,
    n_valid: int,
    k: int,
    group: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k dispatcher, calibrated on v5e at serving batch shapes
    (scripts/bench_batched_topk.py; table in BENCHMARKS.md): at small k
    the block-max candidate set stays tiny so two_stage wins at every
    measured Q (3x at Q=16, k=20 — the round-1 "Q<=4" rule penalised the
    coalesced-serving shape); at k=100 the Q*kb candidate gather grows and
    hier takes over from Q>=4 (1.4-1.7x at Q=4, converged by Q=16). The
    Q<=128 small-k cap hands unmeasured very-large batches (offline eval)
    to hier, whose per-group sort amortises predictably."""
    q = queries.shape[0]
    if q <= 1 or (k <= 50 and q <= 128):
        return two_stage_topk(queries, db_padded, n_valid, k, group)
    return hier_topk(queries, db_padded, n_valid, k, group)


@functools.partial(jax.jit,
                   static_argnames=("k", "n_valid", "recall_target"))
def flat_topk_approx(
    queries: jax.Array,
    db_padded: jax.Array,
    n_valid: int,
    k: int,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """APPROXIMATE flat top-k via the TPU-accelerated PartialReduce op
    (jax.lax.approx_max_k). Measured at the EpicKitchens batch geometry
    (512 queries x 1M x 768, k=1000): 7.4x faster than the exact hier
    scan at recall@1000 = 0.983 (scripts/bench_topk_k1000_variants.py) —
    the honest comparator for the reference's own IndexIVFFlat batch
    mode, which is approximate too. Opt in via
    IndexConfig.flat_approx_recall; the default serve path stays exact.
    On CPU backends approx_max_k lowers to an exact sort, so results
    equal the exact scan there (tests rely on this)."""
    if db_padded.dtype == jnp.bfloat16:
        scores = jax.lax.dot_general(
            queries.astype(jnp.bfloat16), db_padded,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jax.lax.dot_general(
            queries.astype(jnp.float32), db_padded,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    row = jax.lax.broadcasted_iota(jnp.int32, (1, db_padded.shape[0]), 1)
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    return jax.lax.approx_max_k(scores, min(k, n_valid),
                                recall_target=recall_target)


def quantize_rows_int8(db: np.ndarray):
    """Symmetric per-row int8 quantization: returns (codes (N, D) int8,
    scales (N,) f32) with row = codes * scale + err, |err| <= scale/2.
    Zero rows get scale 0 (codes 0) so padding scores exactly 0 like the
    f32 path before masking."""
    db = np.asarray(db, dtype=np.float32)
    absmax = np.abs(db).max(axis=1)
    scales = absmax / 127.0
    inv = np.where(scales > 0, 1.0 / np.where(scales == 0, 1, scales), 0.0)
    codes = np.rint(db * inv[:, None]).astype(np.int8)
    return codes, scales.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("kc", "k", "group", "n_valid", "bf16_dot"))
def int8_candidates(
    queries: jax.Array,
    db_i8: jax.Array,
    row_scales: jax.Array,
    n_valid: int,
    kc: int,
    k: int = None,
    group: int = 4096,
    bf16_dot: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-kc candidate rows from an int8-quantized database.

    The scan reads 1 byte/element — 4x less HBM than f32, 2x less than bf16
    — and scores on the int8 MXU (i32 accumulate), then rescales per row.
    Exactness is restored by the CALLER re-scoring the kc candidates in f32
    (feature_index._search_flat int8 mode; kc = rerank_mult * k). Returns
    (approx scores (Q, kc) f32, rows (Q, kc)).
    """
    n_pad = db_i8.shape[0]
    assert n_pad % group == 0
    kc = min(kc, n_valid)
    q = queries.astype(jnp.float32)
    q_scale = jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0  # (Q, 1)
    q_i8 = jnp.rint(q / jnp.where(q_scale == 0, 1, q_scale)).astype(jnp.int8)
    if bf16_dot:
        # int8 codes convert to bf16 on the operand stream (exact: int8
        # fits bf16's mantissa; every product and a <=2^14-magnitude
        # 512-term sum are exact in f32) — HBM reads stay 1 B/element
        # while the dot runs the well-tiled bf16 MXU path
        raw = jax.lax.dot_general(
            q_i8.astype(jnp.bfloat16), db_i8.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, n_pad) f32, integer-exact
    else:
        raw = jax.lax.dot_general(
            q_i8, db_i8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Q, n_pad) i32
    scores = raw.astype(jnp.float32) * (q_scale * row_scales[None, :])
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    qn = scores.shape[0]
    num_blocks = n_pad // group
    # two_stage-style selection: block-max prunes to kb candidate blocks
    # (cheap VPU max, no big sort), then one top-kc over kb*group scores.
    # kb must be >= the final k (the true top-k can occupy k distinct
    # blocks — same argument as two_stage_topk's exactness proof, modulo
    # the int8 approximation margin); kc > k then adds in-block margin.
    k_floor = k if k is not None else kc
    kb = min(
        num_blocks,
        max(k_floor, _round_up(kc, group) // group, 8),
    )
    blocks = scores.reshape(qn, num_blocks, group)
    block_max = jnp.max(blocks, axis=2)
    _, blk_idx = jax.lax.top_k(block_max, kb)
    blk_idx = jnp.sort(blk_idx, axis=1)
    cand = jnp.take_along_axis(blocks, blk_idx[:, :, None], axis=1)
    cand = cand.reshape(qn, kb * group)
    base = (blk_idx * group)[:, :, None] + jax.lax.broadcasted_iota(
        jnp.int32, (qn, kb, group), 2
    )
    base = base.reshape(qn, kb * group)
    kc = min(kc, kb * group)
    top_v, pos = jax.lax.top_k(cand, kc)
    return top_v, jnp.take_along_axis(base, pos, axis=1)


def int8_candidates_bf16dot(queries, db_i8, row_scales, n_valid,
                            kc, k=None, group: int = 4096):
    """int8_candidates with the convert-on-read bf16 MXU dot (identical
    candidates/scores by integer-exactness; see the bf16_dot branch)."""
    return int8_candidates(queries, db_i8, row_scales, n_valid, kc, k=k,
                           group=group, bf16_dot=True)


def rerank_exact_f32(queries, candidate_rows, vectors, k: int,
                     n_valid=None):
    """Host-side exact re-scoring of device-proposed candidates: gathers the
    candidate rows from the (memmapped) f32 store, scores in f32 with
    numpy's accumulation, and applies the faiss tie-break (equal scores
    prefer the lower row index). candidate_rows may contain duplicates or
    -1/-inf padding lanes; both are handled. Returns (scores (Q, k),
    rows (Q, k)) — identical to the full f32 scan whenever the true top-k
    is inside the candidate set (validated in tests; rerank_mult controls
    the margin)."""
    queries = np.asarray(queries, dtype=np.float32)
    out_v = np.full((queries.shape[0], k), -np.inf, np.float32)
    out_r = np.zeros((queries.shape[0], k), np.int32)
    for qi in range(queries.shape[0]):
        rows = np.unique(candidate_rows[qi])
        rows = rows[rows >= 0]
        if n_valid is not None:
            # -inf candidate lanes still carry indices of padding rows
            rows = rows[rows < n_valid]
        cand = np.asarray(vectors[rows], dtype=np.float32)
        scores = cand @ queries[qi]
        order = np.lexsort((rows, -scores))[:k]
        out_v[qi, : len(order)] = scores[order]
        out_r[qi, : len(order)] = rows[order]
    return out_v, out_r


def pad_rows(db: np.ndarray, group: int = 4096) -> np.ndarray:
    """Pad DB rows with zeros to a multiple of `group` (host-side)."""
    n = db.shape[0]
    n_pad = _round_up(max(n, group), group)
    if n_pad == n:
        return db
    return np.concatenate(
        [db, np.zeros((n_pad - n, db.shape[1]), dtype=db.dtype)], axis=0
    )


def exact_topk(
    queries: np.ndarray,
    db: np.ndarray,
    k: int,
    block_rows: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-convenient wrapper around scan_topk."""
    vals, idx = scan_topk(
        jnp.asarray(queries), jnp.asarray(db), k=int(k), block_rows=int(block_rows)
    )
    return np.asarray(vals), np.asarray(idx)


def numpy_reference_topk(queries, db, k):
    """O(N*Q) float64-free reference used by tests: same tie-break contract."""
    scores = queries.astype(np.float32) @ db.astype(np.float32).T
    k = min(k, db.shape[0])
    # stable argsort on (-score, index)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, order, axis=1)
    return vals, order
