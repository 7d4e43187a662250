"""Vector search index over a feature store.

Replaces the reference's faiss-backed FeatureSearchIndex
(/root/reference/src/index/feature_search_index.py) with the framework's own
engine: an exact streaming scan (IndexFlatIP semantics) and an IVF-Flat mode
(k-means coarse quantizer, cell-sorted storage, nprobe search) — both backed
by the Pallas/XLA top-k ops and an ``.widx`` on-disk format.

Heuristics preserved from the reference (feature_search_index.py:53-59):
nlist = 3*sqrt(N) if N < 200k else 10*sqrt(N); train on min(N, 100*nlist)
samples. Query prompts per modality are preserved too (:24-28).
"""

from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..config import IndexConfig
from ..store.factory import FeatureStoreFactory
from .format import read_index_file, write_index_file
from .search_index import SearchIndex

logger = logging.getLogger(__name__)

QUERY_PROMPTS = {
    "image": "This is a photo of a ",
    "video": "This is a photo of a ",
    "audio": "this is the sound of ",
}


class FeatureSearchIndex(SearchIndex):
    def __init__(self, media_type: str, asset_id: str, asset: dict,
                 config: Optional[IndexConfig] = None):
        self.media_type = media_type
        self.asset_id = asset_id
        self.asset = asset
        self.config = config or IndexConfig()
        self.index_dir = Path(asset["index_dir"])
        self._extractor = None
        self._arrays = None
        self._metadata = None
        self._device_db = None
        self._mesh = None

    # ------------------------------------------------------------------
    def index_path(self, index_type: str) -> Path:
        return self.index_dir / f"{self.media_type}-{index_type}.widx"

    @property
    def extractor(self):
        if self._extractor is None:
            from ..models import FeatureExtractorFactory

            self._extractor = FeatureExtractorFactory(self.asset_id)
        return self._extractor

    # ------------------------------------------------------------------
    def _open_store(self):
        store = FeatureStoreFactory.load_store(
            self.media_type, Path(self.asset["features_dir"])
        )
        store.enable_read()
        return store

    def _ivf_params(self, n: int) -> Tuple[int, int]:
        cfg = self.config
        if n < cfg.ivf_nlist_threshold:
            nlist = int(cfg.ivf_nlist_small_factor * math.sqrt(n))
        else:
            nlist = int(cfg.ivf_nlist_large_factor * math.sqrt(n))
        nlist = max(1, min(nlist, n))
        return nlist, min(n, cfg.ivf_train_per_cell * nlist)

    def _load_store_matrix(self, store) -> Tuple[np.ndarray, np.ndarray]:
        n, d = store.feature_count, store.feature_dim
        ids = np.empty(n, dtype=np.int64)
        vecs = np.empty((n, d), dtype=np.float32)
        row = 0
        for batch_ids, batch in store.iter_batch(4096):
            m = len(batch_ids)
            ids[row : row + m] = batch_ids
            vecs[row : row + m] = batch.reshape(m, d)
            row += m
        assert row == n
        return ids, vecs

    def create_index(self, index_type: str, overwrite: bool = False) -> bool:
        out = self.index_path(index_type)
        if out.exists() and not overwrite:
            logger.info(f"index {out} exists, skipping (overwrite=False)")
            return False
        self.index_dir.mkdir(parents=True, exist_ok=True)
        store = self._open_store()
        n, d = store.feature_count, store.feature_dim
        if n * d * 4 > self.config.stream_build_threshold_bytes:
            return self._create_index_streaming(index_type, out, store, n, d)
        ids, vecs = self._load_store_matrix(store)

        if index_type == "IndexFlatIP":
            write_index_file(
                out,
                {"ids": ids, "vectors": vecs},
                {
                    "index_type": "IndexFlatIP",
                    "metric": "inner_product",
                    "dim": d,
                    "count": n,
                },
            )
        elif index_type in ("IndexIVFFlat", "IndexIVFPQ"):
            cfg = self.config
            nlist, train_count = self._ivf_params(n)
            rng = np.random.default_rng(0)
            train_idx = rng.permutation(n)[:train_count]
            from ..ops.kmeans import _assign, kmeans

            logger.info(f"IVF training: nlist={nlist} train_count={train_count}")
            centroids, _ = kmeans(vecs[train_idx], nlist, iters=20, seed=0)
            assign = np.asarray(_assign(vecs, centroids), dtype=np.int32)
            perm = np.argsort(assign, kind="stable")
            counts = np.bincount(assign, minlength=nlist)
            offsets = np.zeros(nlist + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            meta = {
                "metric": "inner_product",
                "dim": d,
                "count": n,
                "nlist": int(nlist),
            }
            if index_type == "IndexIVFFlat":
                write_index_file(
                    out,
                    {
                        "ids": ids[perm],
                        "vectors": vecs[perm],
                        "centroids": centroids,
                        "cell_offsets": offsets,
                    },
                    {"index_type": "IndexIVFFlat", **meta},
                )
            else:
                from ..ops.pq import encode_pq, train_opq, train_pq

                residuals = vecs - centroids[assign]
                pq_train = residuals[
                    rng.permutation(n)[: min(n, cfg.pq_train_samples)]
                ]
                logger.info(
                    f"PQ training: M={cfg.pq_m} ksub={cfg.pq_ksub} "
                    f"on {len(pq_train)} residuals (opq={cfg.pq_opq})"
                )
                arrays = {}
                centroids_out = centroids
                if cfg.pq_opq:
                    rot, codebooks = train_opq(
                        pq_train, cfg.pq_m, cfg.pq_ksub,
                        opq_iters=cfg.pq_opq_iters,
                    )
                    residuals = residuals @ rot
                    centroids_out = (centroids @ rot).astype(np.float32)
                    arrays["opq_rotation"] = rot
                else:
                    codebooks = train_pq(pq_train, cfg.pq_m, cfg.pq_ksub)
                codes = encode_pq(residuals, codebooks)
                if cfg.pq_refine == "int8":
                    # int8 refine codes in the ORIGINAL basis (rerank scores
                    # q . x directly; OPQ rotation only applies to the ADC)
                    from ..ops.topk import quantize_rows_int8

                    rcodes, rscales = quantize_rows_int8(vecs)
                    arrays["refine_codes"] = rcodes[perm]
                    arrays["refine_scales"] = rscales[perm]
                write_index_file(
                    out,
                    {
                        "ids": ids[perm],
                        "codes": codes[perm],
                        "centroids": centroids_out,
                        "pq_codebooks": codebooks,
                        "cell_offsets": offsets,
                        **arrays,
                    },
                    {"index_type": "IndexIVFPQ", "pq_m": int(cfg.pq_m), **meta},
                )
        else:
            raise ValueError(f"unsupported index_type {index_type}")
        logger.info(f"wrote {out}")
        return True

    # ------------------------------------------------------------------
    # streaming (> RAM) build: never materialises the (N, D) f32 matrix.
    # Flat is a single sequential pass. IVF/PQ: pass 1 gathers bounded
    # training samples, pass 2 assigns cells batch-by-batch (device matmul),
    # pass 3 scatter-writes each row to its cell-sorted destination through
    # IndexFileWriter (sequential read, seek-write; the OS page cache
    # absorbs the small out-of-order writes). RAM stays O(N) ints +
    # O(train) vectors. Produces files readers can't tell apart from the
    # in-memory path's.
    # ------------------------------------------------------------------
    STREAM_BATCH = 4096

    def _create_index_streaming(self, index_type, out, store, n, d) -> bool:
        logger.info(
            f"streaming index build: type={index_type} n={n} d={d}"
        )
        meta = {"metric": "inner_product", "dim": d, "count": n}
        from .format import IndexFileWriter

        if index_type == "IndexFlatIP":
            specs = {"ids": (np.int64, (n,)), "vectors": (np.float32, (n, d))}
            with IndexFileWriter(
                out, specs, {"index_type": "IndexFlatIP", **meta}
            ) as w:
                row = 0
                for batch_ids, batch in store.iter_batch(self.STREAM_BATCH):
                    m = len(batch_ids)
                    w.write_rows("ids", row, np.asarray(batch_ids, np.int64))
                    w.write_rows("vectors", row, batch.reshape(m, d))
                    row += m
                assert row == n
            logger.info(f"wrote {out} (streamed)")
            return True
        if index_type not in ("IndexIVFFlat", "IndexIVFPQ"):
            raise ValueError(f"unsupported index_type {index_type}")

        from ..ops.kmeans import _assign, kmeans

        cfg = self.config
        nlist, train_count = self._ivf_params(n)
        train_count = min(train_count, cfg.ivf_stream_train_max)
        rng = np.random.default_rng(0)
        train_idx = rng.permutation(n)[:train_count]
        samples = [train_idx]
        if index_type == "IndexIVFPQ":
            samples.append(rng.permutation(n)[: min(n, cfg.pq_train_samples)])
        logger.info(f"IVF training: nlist={nlist} train_count={train_count}")
        sampled = self._gather_rows(store, samples, d)

        centroids, _ = kmeans(sampled[0], nlist, iters=20, seed=0)

        # pass 2: cell assignment for every row (device matmul per batch)
        assign = np.empty(n, dtype=np.int32)
        ids = np.empty(n, dtype=np.int64)
        row = 0
        for batch_ids, batch in store.iter_batch(self.STREAM_BATCH):
            m = len(batch_ids)
            ids[row : row + m] = batch_ids
            assign[row : row + m] = np.asarray(
                _assign(batch.reshape(m, d), centroids)
            )
            row += m
        assert row == n
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        order = np.argsort(assign, kind="stable")
        dest = np.empty(n, dtype=np.int64)
        dest[order] = np.arange(n)
        meta["nlist"] = int(nlist)

        opq_rot = None
        centroids_out = centroids
        if index_type == "IndexIVFPQ":
            from ..ops.pq import encode_pq, train_opq, train_pq

            pq_rows = sampled[1]
            pq_assign = np.asarray(_assign(pq_rows, centroids))
            logger.info(
                f"PQ training: M={cfg.pq_m} ksub={cfg.pq_ksub} "
                f"on {len(pq_rows)} residuals (opq={cfg.pq_opq})"
            )
            pq_resid = pq_rows - centroids[pq_assign]
            if cfg.pq_opq:
                opq_rot, codebooks = train_opq(
                    pq_resid, cfg.pq_m, cfg.pq_ksub,
                    opq_iters=cfg.pq_opq_iters,
                )
                centroids_out = (centroids @ opq_rot).astype(np.float32)
            else:
                codebooks = train_pq(pq_resid, cfg.pq_m, cfg.pq_ksub)
            specs = {
                "ids": (np.int64, (n,)),
                "codes": (np.uint8, (n, cfg.pq_m)),
                "centroids": (np.float32, centroids.shape),
                "pq_codebooks": (np.float32, codebooks.shape),
                "cell_offsets": (np.int64, (nlist + 1,)),
            }
            if opq_rot is not None:
                specs["opq_rotation"] = (np.float32, opq_rot.shape)
            if cfg.pq_refine == "int8":
                specs["refine_codes"] = (np.int8, (n, d))
                specs["refine_scales"] = (np.float32, (n,))
            header = {"index_type": "IndexIVFPQ", "pq_m": int(cfg.pq_m), **meta}
        else:
            specs = {
                "ids": (np.int64, (n,)),
                "vectors": (np.float32, (n, d)),
                "centroids": (np.float32, centroids.shape),
                "cell_offsets": (np.int64, (nlist + 1,)),
            }
            header = {"index_type": "IndexIVFFlat", **meta}

        # pass 3: scatter rows (or codes) to their cell-sorted destinations
        with IndexFileWriter(out, specs, header) as w:
            w.write_rows("ids", 0, ids[order])
            w.write_rows("centroids", 0, centroids_out)
            w.write_rows("cell_offsets", 0, offsets)
            if index_type == "IndexIVFPQ":
                w.write_rows("pq_codebooks", 0, codebooks)
            if opq_rot is not None:
                w.write_rows("opq_rotation", 0, opq_rot)
            row = 0
            name = "codes" if index_type == "IndexIVFPQ" else "vectors"
            refine = (
                index_type == "IndexIVFPQ" and cfg.pq_refine == "int8"
            )
            if refine:
                from ..ops.topk import quantize_rows_int8
            for _, batch in store.iter_batch(self.STREAM_BATCH):
                batch = batch.reshape(-1, d)
                m = batch.shape[0]
                if refine:
                    rcodes, rscales = quantize_rows_int8(batch)
                    self._scatter_rows(
                        w, "refine_codes", dest[row : row + m], rcodes
                    )
                    self._scatter_rows(
                        w, "refine_scales", dest[row : row + m], rscales
                    )
                if index_type == "IndexIVFPQ":
                    resid = batch - centroids[assign[row : row + m]]
                    if opq_rot is not None:
                        resid = resid @ opq_rot
                    batch = encode_pq(resid, codebooks)
                self._scatter_rows(w, name, dest[row : row + m], batch)
                row += m
        logger.info(f"wrote {out} (streamed)")
        return True

    @staticmethod
    def _gather_rows(store, index_lists, d):
        """One sequential pass collecting the given global-row samples, each
        returned in its original (permutation) order."""
        outs = [np.empty((len(s), d), np.float32) for s in index_lists]
        orders = [np.argsort(s) for s in index_lists]
        sorted_rows = [s[o] for s, o in zip(index_lists, orders)]
        row = 0
        for _, batch in store.iter_batch(FeatureSearchIndex.STREAM_BATCH):
            batch = batch.reshape(-1, d)
            m = batch.shape[0]
            for out, srows, order in zip(outs, sorted_rows, orders):
                lo = np.searchsorted(srows, row)
                hi = np.searchsorted(srows, row + m)
                if hi > lo:
                    out[order[lo:hi]] = batch[srows[lo:hi] - row]
            row += m
        return outs

    @staticmethod
    def _scatter_rows(writer, name, dest, data):
        """Write batch rows to non-contiguous destinations, coalescing
        consecutive runs into single writes."""
        order = np.argsort(dest, kind="stable")
        dest_sorted = dest[order]
        data_sorted = data[order]
        cuts = np.nonzero(np.diff(dest_sorted) != 1)[0] + 1
        start = 0
        for stop in list(cuts) + [len(dest_sorted)]:
            writer.write_rows(
                name, int(dest_sorted[start]), data_sorted[start:stop]
            )
            start = stop

    # ------------------------------------------------------------------
    def load_index(self, index_type: str) -> bool:
        path = self.index_path(index_type)
        if not path.exists():
            return False
        self._metadata, self._arrays = read_index_file(path)
        self._index_type = self._metadata["index_type"]
        self._device_db = None
        for cached in (  # drop stale device copies
            "_ivf_dev", "_pq_sharded", "_ivf_lmax", "_pq_lmax",
            "_ivf_paged", "_pq_paged", "_ivf_sharded_pg",
            "_int8_db", "_int8_sharded", "_flat_sibling",
        ):
            if hasattr(self, cached):
                delattr(self, cached)
        return True

    GROUP = 4096  # top-k group size; DB rows pad to a multiple of this

    def _ensure_device_db(self):
        """Move vectors to accelerator memory once (HBM-resident), rows
        padded to a multiple of GROUP for the hierarchical top-k. With
        config.storage_dtype == "bfloat16" the HBM copy is bf16 (half the
        scan bandwidth -> ~2x faster; scores still accumulate f32, ordering
        may differ from f32 storage in the last ulp).

        With more than one device visible, rows are sharded over a 'dp' mesh
        (each chip scans its shard; ICI all-gather merges per-chip top-k —
        parallel/sharded_search.py)."""
        if self._device_db is None:
            import jax
            import jax.numpy as jnp

            from ..ops.topk import pad_rows

            host = pad_rows(np.asarray(self._arrays["vectors"]), self.GROUP)
            if jax.device_count() > 1:
                from ..parallel.mesh import get_mesh
                from ..parallel.sharded_search import pad_and_shard_db

                self._mesh = get_mesh(dp=jax.device_count())
                arr, _ = pad_and_shard_db(self._mesh, host)
            else:
                arr = jax.device_put(host)
            if self.config.storage_dtype == "bfloat16":
                arr = jax.jit(lambda x: x.astype(jnp.bfloat16))(arr)
            self._device_db = arr
        return self._device_db

    # ------------------------------------------------------------------
    def search(
        self, media_type: str, query, topk: int, query_type: str = "text"
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._arrays is None:
            raise RuntimeError("load_index() must be called before search()")
        if query_type == "text":
            prompt = QUERY_PROMPTS.get(media_type, "")
            qvec = self.extractor.extract_text_features([prompt + str(query)])
        else:
            qvec = np.atleast_2d(np.asarray(query, dtype=np.float32))

        scores, rows = self._dispatch_search(qvec, topk)
        ids = self._rows_to_ids(scores, rows)
        return scores[0], ids[0]

    def _rows_to_ids(self, scores, rows):
        """Map result rows to vector ids; empty (-inf) slots — IVF/PQ probes
        can return fewer than k candidates — report id -1 so consumers drop
        them (faiss convention)."""
        ids = np.asarray(self._arrays["ids"])[rows]
        ids[np.isneginf(scores)] = -1
        return ids

    def _dispatch_search(self, qvec, topk):
        if (
            self.config.storage_dtype == "int8"
            and self._index_type != "IndexFlatIP"
            and not getattr(self, "_warned_int8_ivf", False)
        ):
            self._warned_int8_ivf = True
            logger.warning(
                "storage_dtype=int8 only applies to IndexFlatIP; the %s "
                "paged device copy keeps its own dtype (f32, or bf16 via "
                "storage_dtype=bfloat16)", self._index_type,
            )
        if self._index_type == "IndexFlatIP":
            return self._search_flat(qvec, topk)
        if self._index_type == "IndexIVFFlat":
            return self._search_ivf(qvec, topk, self.config.nprobe)
        if self._index_type == "IndexIVFPQ":
            return self._search_ivfpq(qvec, topk, self.config.nprobe)
        raise ValueError(f"unknown index type {self._index_type}")

    def search_batch(
        self, query_vectors: np.ndarray, topk: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) query vectors -> (scores (Q, k), ids (Q, k))."""
        qvec = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
        scores, rows = self._dispatch_search(qvec, topk)
        return scores, self._rows_to_ids(scores, rows)

    def search_batch_dispatch(self, query_vectors: np.ndarray, topk: int):
        """Dispatch-only half of ``search_batch`` for the serving coalescer
        (api/coalesce.py two-phase mode): returns an opaque handle whose
        rows are realised by ``search_batch_finalize``. On the async-capable
        path (single-chip flat f32/bf16 — the serve default) the handle
        carries UNREALISED jax arrays, so the caller's critical section
        costs one jit enqueue instead of a device->host roundtrip and
        readbacks overlap across requester threads. Other paths (int8
        rerank, IVF/IVF-PQ, sharded) fall back to computing here; their
        handle is already-realised numpy and finalize is a cheap slice."""
        qvec = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
        if (
            self._index_type == "IndexFlatIP"
            and self.config.storage_dtype != "int8"
            and self._mesh is None
        ):
            from ..ops.topk import flat_topk

            n_valid = int(self._metadata["count"])
            k = min(int(topk), n_valid)
            db = self._ensure_device_db()
            vals, rows = flat_topk(
                qvec, db, n_valid=n_valid, k=k, group=self.GROUP
            )
            return (vals, rows)  # unrealised device arrays
        return self._dispatch_search(qvec, topk)

    def search_batch_finalize(self, handle, i: int):
        """Realise row ``i`` of a ``search_batch_dispatch`` handle ->
        (scores (k,), ids (k,)). np.asarray on the device arrays blocks
        until the batch's computation lands; on numpy handles it's free."""
        vals, rows = handle
        v = np.asarray(vals[i : i + 1])
        r = np.asarray(rows[i : i + 1])
        return v[0], self._rows_to_ids(v, r)[0]

    def _ensure_int8_db(self):
        """int8 HBM copy: (codes (N_pad, D) int8, per-row scales (N_pad,)).

        Quantizes row-chunks straight off the memmap into a preallocated
        int8 buffer — the transient is one 64k-row f32 chunk (~128 MB at
        D=512), not a full padded f32 copy of the database."""
        if getattr(self, "_int8_db", None) is None:
            import jax

            from ..ops.topk import _round_up, quantize_rows_int8

            vecs = self._arrays["vectors"]
            n, d = vecs.shape
            n_pad = _round_up(max(n, self.GROUP), self.GROUP)
            codes = np.zeros((n_pad, d), np.int8)
            scales = np.zeros((n_pad,), np.float32)
            chunk = 65536
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                codes[s:e], scales[s:e] = quantize_rows_int8(vecs[s:e])
            self._int8_db = (jax.device_put(codes), jax.device_put(scales))
        return self._int8_db

    def _ensure_int8_db_sharded(self):
        """Row-sharded int8 copy over a 'dp' mesh (quantized on host, padded
        rows quantize to scale 0 so they score exactly 0 before masking)."""
        if getattr(self, "_int8_sharded", None) is None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..ops.topk import quantize_rows_int8
            from ..parallel.mesh import get_mesh
            from ..parallel.sharded_search import pad_and_shard_db

            mesh = get_mesh(dp=jax.device_count())
            codes_h, scales_h = quantize_rows_int8(
                np.asarray(self._arrays["vectors"])
            )
            codes, _ = pad_and_shard_db(mesh, codes_h)
            n_pad = codes.shape[0]
            scales_h = np.pad(scales_h, (0, n_pad - len(scales_h)))
            scales = jax.device_put(
                scales_h, NamedSharding(mesh, P("dp"))
            )
            self._int8_sharded = (codes, scales, mesh)
        return self._int8_sharded

    def _search_flat(self, qvec, topk):
        from ..ops.topk import flat_topk

        n_valid = int(self._metadata["count"])
        k = min(int(topk), n_valid)
        if self.config.storage_dtype == "int8":
            # device(s) propose rerank_mult*k candidates from the
            # 1-byte/element quantized copy (row-sharded over 'dp' when more
            # than one device is visible); host re-scores them in f32
            import jax

            from ..ops.topk import int8_candidates, rerank_exact_f32

            kc = min(self.config.int8_rerank_mult * k, n_valid)
            if jax.device_count() > 1:
                from ..parallel.sharded_search import sharded_int8_candidates

                codes, scales, mesh = self._ensure_int8_db_sharded()
                _, cand = sharded_int8_candidates(
                    mesh, qvec, codes, scales, n_valid, kc
                )
            else:
                codes, scales = self._ensure_int8_db()
                _, cand = int8_candidates(
                    qvec, codes, scales, n_valid=n_valid, kc=kc, k=k,
                    group=self.GROUP,
                )
            return rerank_exact_f32(
                qvec, np.asarray(cand), self._arrays["vectors"], k,
                n_valid=n_valid,
            )
        db = self._ensure_device_db()
        if self._mesh is not None:
            from ..parallel.sharded_search import sharded_scan_topk

            return sharded_scan_topk(self._mesh, qvec, db, n_valid, k)
        if self.config.flat_approx_recall > 0.0:
            from ..ops.topk import flat_topk_approx

            vals, idx = flat_topk_approx(
                qvec, db, n_valid=n_valid, k=k,
                recall_target=float(self.config.flat_approx_recall),
            )
            return np.asarray(vals), np.asarray(idx)
        vals, idx = flat_topk(qvec, db, n_valid=n_valid, k=k, group=self.GROUP)
        return np.asarray(vals), np.asarray(idx)

    def _rotate_q_pq(self, qvec: np.ndarray) -> np.ndarray:
        """OPQ: the .widx stores ROTATED centroids + codebooks trained in
        rotated space; one orthogonal rotation of the query puts probe and
        ADC in that space (inner products invariant)."""
        if "opq_rotation" in self._arrays:
            rot = np.asarray(self._arrays["opq_rotation"], np.float32)
            return (qvec.astype(np.float32) @ rot).astype(np.float32)
        return qvec

    def reconstruct_rows(self, rows) -> np.ndarray:
        """Stored vectors by row (faiss reconstruct_batch parity,
        routes.py:1077-1146). Flat/IVF return exact rows; IVF-PQ with an
        int8 refine stage reconstructs from the refine codes (~1e-3
        relative error — far closer than a PQ decode); codes-only IVF-PQ
        decodes cell_centroid + per-subspace codebook entries (lossy,
        like faiss), un-rotating OPQ-space reconstructions back to the
        original basis."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        if "vectors" in self._arrays:
            return np.asarray(self._arrays["vectors"][rows], np.float32)
        if "refine_codes" in self._arrays:
            cand = np.asarray(self._arrays["refine_codes"][rows], np.float32)
            scales = np.asarray(
                self._arrays["refine_scales"][rows], np.float32
            )
            return cand * scales[:, None]
        codes = np.asarray(self._arrays["codes"][rows], np.int64)
        centroids = np.asarray(self._arrays["centroids"])
        books = np.asarray(self._arrays["pq_codebooks"])
        offsets = np.asarray(self._arrays["cell_offsets"])
        cells = np.searchsorted(offsets, rows, side="right") - 1
        m = books.shape[0]
        resid = np.concatenate(
            [books[i][codes[:, i]] for i in range(m)], axis=1
        )
        out = (centroids[cells] + resid).astype(np.float32)
        if "opq_rotation" in self._arrays:
            rot = np.asarray(self._arrays["opq_rotation"], np.float32)
            out = out @ rot.T
        return out.astype(np.float32)

    def _search_ivfpq(self, qvec, topk, nprobe):
        """IVF+PQ dispatch: single-device -> fully on-device jitted ADC
        (ops/ivf_paged.py, uint8 codes HBM-resident); multi-device ->
        shard_map ADC over row-sharded codes with ICI top-k merge.

        Rerank backstop (config.pq_exact_rerank, on by default): the ADC
        proposes pq_rerank_mult*k candidates, which are re-scored on the
        host from the best available source — a sibling IndexFlatIP file
        (exact f32 rows) when one exists, else the in-file int8 refine
        codes (config.pq_refine, stored at build; D bytes/row vs the flat
        sibling's 4D). Either way, PQ quantization error only affects
        which candidates are considered, not their relative order beyond
        the rescore precision (exact for flat, ~1e-3 for int8)."""
        import jax

        k = int(topk)
        rerank = None
        if self.config.pq_exact_rerank:
            if self._ensure_flat_sibling() is not None:
                rerank = "flat"
            elif "refine_codes" in self._arrays:
                rerank = "refine"
        k_ask = k
        if rerank is not None:
            k_ask = min(
                self.config.pq_rerank_mult * k, len(self._arrays["ids"])
            )
        if jax.device_count() == 1:
            vals, rows = self._search_ivfpq_device(qvec, k_ask, nprobe)
        else:
            vals, rows = self._search_ivfpq_sharded(qvec, k_ask, nprobe)
        if rerank == "flat":
            return self._rerank_pq_candidates(qvec, vals, rows, k)
        if rerank == "refine":
            return self._rerank_refine_candidates(qvec, vals, rows, k)
        return vals, rows

    def _ensure_flat_sibling(self):
        """Memmapped (vectors, ids, argsort(ids)) of the same asset's
        IndexFlatIP file, or None when it doesn't exist."""
        if not hasattr(self, "_flat_sibling"):
            path = self.index_path("IndexFlatIP")
            if not path.exists():
                self._flat_sibling = None
            else:
                _, arrays = read_index_file(path)
                fids = np.asarray(arrays["ids"])
                self._flat_sibling = (
                    arrays["vectors"], fids, np.argsort(fids)
                )
        return self._flat_sibling

    def _rerank_pq_candidates(self, qvec, vals, rows, k: int):
        """Exact host rescoring of ADC candidates from the flat sibling:
        PQ rows -> vector ids -> flat rows -> f32 dot; ties prefer the
        lower vector id. Returns (scores, rows) in PQ row space."""
        vecs, fids, order = self._flat_sibling
        pq_ids = np.asarray(self._arrays["ids"])
        sorted_ids = fids[order]
        q32 = np.asarray(qvec, dtype=np.float32)
        out_v = np.full((q32.shape[0], k), -np.inf, np.float32)
        out_r = np.zeros((q32.shape[0], k), np.int64)
        for qi in range(q32.shape[0]):
            keep = ~np.isneginf(vals[qi])
            prows = np.unique(np.asarray(rows[qi])[keep]).astype(np.int64)
            if not len(prows):
                continue
            ids = pq_ids[prows]
            pos = np.searchsorted(sorted_ids, ids)
            pos = np.minimum(pos, len(sorted_ids) - 1)
            ok = sorted_ids[pos] == ids
            prows, ids, pos = prows[ok], ids[ok], pos[ok]
            frows = order[pos]
            scores = np.asarray(vecs[frows], np.float32) @ q32[qi]
            sel = np.lexsort((ids, -scores))[:k]
            out_v[qi, : len(sel)] = scores[sel]
            out_r[qi, : len(sel)] = prows[sel]
        return out_v, out_r

    def _rerank_refine_candidates(self, qvec, vals, rows, k: int):
        """Host rescoring of ADC candidates from the in-file int8 refine
        codes: score = (codes[row] . q) * scale[row] ≈ x[row] . q to int8
        precision. Candidates are PQ rows already, so the gather is a
        direct memmap read (~kc * D bytes). Ties prefer the lower vector
        id, matching the flat-sibling rerank."""
        codes = self._arrays["refine_codes"]  # memmap (N, D) int8
        scales = self._arrays["refine_scales"]
        pq_ids = np.asarray(self._arrays["ids"])
        q32 = np.asarray(qvec, dtype=np.float32)
        out_v = np.full((q32.shape[0], k), -np.inf, np.float32)
        out_r = np.zeros((q32.shape[0], k), np.int64)
        for qi in range(q32.shape[0]):
            keep = ~np.isneginf(vals[qi])
            prows = np.unique(np.asarray(rows[qi])[keep]).astype(np.int64)
            if not len(prows):
                continue
            cand = np.asarray(codes[prows], np.float32)
            scores = (cand @ q32[qi]) * np.asarray(scales[prows], np.float32)
            ids = pq_ids[prows]
            sel = np.lexsort((ids, -scores))[:k]
            out_v[qi, : len(sel)] = scores[sel]
            out_r[qi, : len(sel)] = prows[sel]
        return out_v, out_r

    def _search_ivfpq_sharded(self, qvec, topk, nprobe):
        import jax

        qvec = self._rotate_q_pq(qvec)

        from ..parallel.sharded_search import sharded_ivfpq_paged_topk

        if not hasattr(self, "_pq_sharded"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import get_mesh

            self._mesh = get_mesh(dp=jax.device_count())
            rep = NamedSharding(self._mesh, P())
            pg = self._shard_paged(
                "codes", self.config.ivfpq_page_rows, cast_bf16=False
            )
            pg["codebooks"] = jax.device_put(
                np.asarray(self._arrays["pq_codebooks"]), rep
            )
            self._pq_sharded = pg
        centroids, _ = self._ensure_ivf_coarse()
        pg = self._pq_sharded
        nlist = centroids.shape[0]
        nprobe = min(int(nprobe), nlist)
        budget, chunk = self._sharded_paged_plan(
            pg, nprobe, nq=qvec.shape[0], pq=True)
        vals, rows = sharded_ivfpq_paged_topk(
            self._mesh, qvec.astype(np.float32), centroids, pg,
            pg["codebooks"],
            nprobe=nprobe, k=int(topk), chunk=chunk, budget=budget,
        )
        return self._pad_device_topk(vals, rows, topk)

    def _shard_paged(self, array_name, lpad, cast_bf16):
        """Build the cell-partitioned paged layout and device_put it
        sharded over the 'dp' mesh (each chip runs the single-chip paged
        kernel on its own cell range)."""
        from ..parallel.sharded_search import build_sharded_paged

        return build_sharded_paged(
            self._mesh, self._arrays[array_name],
            self._arrays["cell_offsets"], lpad,
            cast_bf16=cast_bf16 and self.config.storage_dtype == "bfloat16",
        )

    def _sharded_paged_plan(self, pg, nprobe, nq=1, pq=False):
        from ..parallel.sharded_search import sharded_paged_plan

        dim = int(self._metadata["dim"])
        # the PQ ADC's per-row one-hot is ksub (<=256) f32 wide — budget on
        # whichever buffer dominates (default_chunk docstring)
        return sharded_paged_plan(pg, nprobe, max(dim, 256) if pq else dim,
                                  nq=nq)

    def _ensure_paged(self, attr, array_name, lpad, cast_bf16):
        """Device-resident paged layout (ops/ivf_paged.py) over the
        cell-sorted rows/codes, built once per load."""
        if not hasattr(self, attr):
            import jax
            import jax.numpy as jnp

            from ..ops.ivf_paged import build_paged_layout

            lay = build_paged_layout(
                np.asarray(self._arrays[array_name]),
                np.asarray(self._arrays["cell_offsets"]),
                lpad,
            )
            paged = jax.device_put(lay["paged"])
            if cast_bf16 and self.config.storage_dtype == "bfloat16":
                paged = jax.jit(lambda x: x.astype(jnp.bfloat16))(paged)
            setattr(self, attr, {
                "paged": paged,
                "page_rows": jax.device_put(lay["page_rows"]),
                "page_first": jax.device_put(lay["page_first"]),
                "page_count": jax.device_put(lay["page_count"]),
                "page_count_host": lay["page_count"],
            })
        return getattr(self, attr)

    def _paged_plan(self, pg, nprobe, nq=1, pq=False):
        from ..ops.ivf_paged import default_chunk, paged_budget

        budget = paged_budget(pg["page_count_host"], nprobe)
        lpad = pg["paged"].shape[1]
        dim = int(self._metadata["dim"])
        chunk = default_chunk(lpad, max(dim, 256) if pq else dim, budget,
                              nq=nq)
        return budget, chunk

    def _search_ivfpq_device(self, qvec, topk, nprobe):
        import jax

        qvec = self._rotate_q_pq(qvec)

        from ..ops.ivf_paged import ivfpq_search_paged

        centroids, _ = self._ensure_ivf_coarse()
        pg = self._ensure_paged(
            "_pq_paged", "codes", self.config.ivfpq_page_rows, cast_bf16=False
        )
        if "codebooks" not in pg:
            pg["codebooks"] = jax.device_put(
                np.asarray(self._arrays["pq_codebooks"])
            )
        nlist = centroids.shape[0]
        nprobe = min(int(nprobe), nlist)
        budget, chunk = self._paged_plan(pg, nprobe, nq=qvec.shape[0],
                                         pq=True)
        vals, rows = ivfpq_search_paged(
            qvec.astype(np.float32), centroids,
            pg["page_first"], pg["page_count"], pg["paged"], pg["page_rows"],
            pg["codebooks"],
            nprobe=nprobe, budget=budget, chunk=chunk, k=int(topk),
        )
        return self._pad_device_topk(vals, rows, topk)

    @staticmethod
    def _pad_device_topk(vals, rows, topk):
        """Match the host convention: empty (-inf) slots report row 0, and
        results pad out to the requested k."""
        vals, rows = np.asarray(vals), np.asarray(rows).astype(np.int64)
        rows[np.isneginf(vals)] = 0
        if vals.shape[1] < topk:
            pad = topk - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            rows = np.pad(rows, ((0, 0), (0, pad)))
        return vals, rows

    def _search_ivfpq_host(self, qvec, topk, nprobe):
        """IVF+PQ asymmetric-distance search: score = q . cell_centroid +
        sum_m LUT[m, code_m] over probed cells (reference config
        docs/Search-Index-Evaluation.md)."""
        from ..ops.pq import adc_scores, adc_tables

        qvec = self._rotate_q_pq(qvec)
        centroids = np.asarray(self._arrays["centroids"])
        offsets = np.asarray(self._arrays["cell_offsets"])
        codebooks = np.asarray(self._arrays["pq_codebooks"])
        codes = self._arrays["codes"]  # memmap
        nlist = centroids.shape[0]
        nprobe = min(int(nprobe), nlist)
        cscores = qvec.astype(np.float32) @ centroids.T
        probe_cells = np.argsort(-cscores, axis=1, kind="stable")[:, :nprobe]

        out_scores = np.full((qvec.shape[0], topk), -np.inf, dtype=np.float32)
        out_rows = np.zeros((qvec.shape[0], topk), dtype=np.int64)
        for qi in range(qvec.shape[0]):
            tables = adc_tables(qvec[qi], codebooks)
            cand_scores = []
            cand_rows = []
            for c in np.sort(probe_cells[qi]):
                a, b = int(offsets[c]), int(offsets[c + 1])
                if b <= a:
                    continue
                s = adc_scores(np.asarray(codes[a:b]), tables)
                s += cscores[qi, c]
                cand_scores.append(s)
                cand_rows.append(np.arange(a, b, dtype=np.int64))
            if not cand_scores:
                continue
            s = np.concatenate(cand_scores)
            r = np.concatenate(cand_rows)
            k = min(int(topk), len(s))
            order = np.argsort(-s, kind="stable")[:k]
            out_scores[qi, :k] = s[order]
            out_rows[qi, :k] = r[order]
        return out_scores, out_rows

    def _search_ivf(self, qvec, topk, nprobe):
        """IVF dispatch: single-device -> fully on-device jitted search
        (ops/ivf_paged.py); multi-device -> shard_map search over row-sharded HBM
        (parallel/sharded_search.py, replicated coarse probe + per-chip
        masked gather + ICI top-k merge)."""
        import jax

        if jax.device_count() == 1:
            return self._search_ivf_device(qvec, topk, nprobe)
        return self._search_ivf_sharded(qvec, topk, nprobe)

    def _ensure_ivf_coarse(self):
        """Centroids + global cell offsets on device (replicated over the
        mesh when one exists)."""
        if not hasattr(self, "_ivf_dev"):
            import jax

            offsets = np.asarray(self._arrays["cell_offsets"], dtype=np.int32)
            self._ivf_lmax = int(max(np.max(np.diff(offsets)), 1))
            centroids = np.asarray(self._arrays["centroids"])
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._mesh, P())
                self._ivf_dev = (
                    jax.device_put(centroids, rep),
                    jax.device_put(offsets, rep),
                )
            else:
                self._ivf_dev = (
                    jax.device_put(centroids), jax.device_put(offsets)
                )
        return self._ivf_dev

    def _search_ivf_sharded(self, qvec, topk, nprobe):
        import jax

        from ..parallel.sharded_search import sharded_ivf_paged_topk

        if not hasattr(self, "_ivf_sharded_pg"):
            from ..parallel.mesh import get_mesh

            self._mesh = get_mesh(dp=jax.device_count())
            self._ivf_sharded_pg = self._shard_paged(
                "vectors", self.config.ivf_page_rows, cast_bf16=True
            )
        centroids, _ = self._ensure_ivf_coarse()
        pg = self._ivf_sharded_pg
        nlist = centroids.shape[0]
        nprobe = min(int(nprobe), nlist)
        budget, chunk = self._sharded_paged_plan(pg, nprobe,
                                                 nq=qvec.shape[0])
        vals, rows = sharded_ivf_paged_topk(
            self._mesh, qvec.astype(np.float32), centroids, pg,
            nprobe=nprobe, k=int(topk), chunk=chunk, budget=budget,
        )
        return self._pad_device_topk(vals, rows, topk)

    def _search_ivf_device(self, qvec, topk, nprobe):
        from ..ops.ivf_paged import ivf_search_paged

        centroids_dev, _ = self._ensure_ivf_coarse()
        pg = self._ensure_paged(
            "_ivf_paged", "vectors", self.config.ivf_page_rows, cast_bf16=True
        )
        nlist = centroids_dev.shape[0]
        nprobe = min(int(nprobe), nlist)
        budget, chunk = self._paged_plan(pg, nprobe, nq=qvec.shape[0])
        vals, rows = ivf_search_paged(
            qvec.astype(np.float32), centroids_dev,
            pg["page_first"], pg["page_count"], pg["paged"], pg["page_rows"],
            nprobe=nprobe, budget=budget, chunk=chunk, k=int(topk),
        )
        return self._pad_device_topk(vals, rows, topk)

    def _search_ivf_host(self, qvec, topk, nprobe):
        from ..ops.topk import scan_topk

        centroids = np.asarray(self._arrays["centroids"])
        offsets = np.asarray(self._arrays["cell_offsets"])
        nlist = centroids.shape[0]
        nprobe = min(int(nprobe), nlist)
        # coarse scores by inner product against centroids
        cscores = qvec.astype(np.float32) @ centroids.T
        probe_cells = np.argsort(-cscores, axis=1, kind="stable")[:, :nprobe]

        vectors = self._arrays["vectors"]  # memmap: cell-sorted
        out_scores = np.full((qvec.shape[0], topk), -np.inf, dtype=np.float32)
        out_rows = np.zeros((qvec.shape[0], topk), dtype=np.int64)
        for qi in range(qvec.shape[0]):
            cells = np.sort(probe_cells[qi])
            spans = [(offsets[c], offsets[c + 1]) for c in cells]
            spans = [(int(a), int(b)) for a, b in spans if b > a]
            if not spans:
                continue
            cand = np.concatenate([vectors[a:b] for a, b in spans], axis=0)
            cand_rows = np.concatenate(
                [np.arange(a, b, dtype=np.int64) for a, b in spans]
            )
            k = min(int(topk), cand.shape[0])
            vals, idx = scan_topk(
                qvec[qi : qi + 1], cand, k=k,
                block_rows=self.config.scan_block_rows,
            )
            vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
            out_scores[qi, :k] = vals
            out_rows[qi, :k] = cand_rows[idx]
        return out_scores, out_rows
