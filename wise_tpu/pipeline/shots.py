"""Shot boundary detection over decoded frame streams.

The reference approximates shots by merging segments with <= 4 s gaps at
serve time (api/routes.py:523-580) and delegates true shot detection to a
separate TransNetV2 repo that writes a shots table (docs/Shot-Detection.md).
Here a content-based detector is built in: frames are downsampled on device,
per-adjacent-frame colour-histogram + pixel-difference scores are computed in
one jitted pass, and boundaries are thresholded adaptively. Results land in
a ``shots`` table inside the project's internal DB, and the serve-time shot
merging keeps working unchanged on top.
"""

from __future__ import annotations

import functools
import logging
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

SHOTS_SCHEMA = """
CREATE TABLE IF NOT EXISTS shots (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    media_id INTEGER NOT NULL,
    start_time FLOAT NOT NULL,
    end_time FLOAT NOT NULL
);
CREATE INDEX IF NOT EXISTS ix_shots_media_id ON shots (media_id);
"""


@functools.partial(jax.jit, static_argnames=("bins",))
def frame_change_scores(frames: jax.Array, bins: int = 16) -> jax.Array:
    """frames (T, H, W, 3) uint8 -> (T-1,) change score in [0, 2].

    Score = histogram intersection distance + mean absolute pixel difference
    on 32x32 thumbnails; both in [0, 1]."""
    t = frames.shape[0]
    small = jax.image.resize(
        frames.astype(jnp.float32) / 255.0,
        (t, 32, 32, 3),
        method="linear",
    )
    # per-channel histograms via one-hot binning
    q = jnp.clip((small * bins).astype(jnp.int32), 0, bins - 1)
    one_hot = jax.nn.one_hot(q.reshape(t, -1, 3), bins, axis=-1)
    hist = one_hot.sum(axis=1) / (32 * 32)          # (T, 3, bins)
    inter = jnp.minimum(hist[:-1], hist[1:]).sum(axis=(1, 2)) / 3.0
    hist_d = 1.0 - inter                             # [0,1]
    pix_d = jnp.abs(small[1:] - small[:-1]).mean(axis=(1, 2, 3))
    return hist_d + pix_d


def detect_shots(
    frames: np.ndarray,
    pts: np.ndarray,
    threshold: float = 0.2,
    adaptive_k: float = 8.0,
) -> List[Tuple[float, float]]:
    """Returns [(start_s, end_s)] shot spans covering the sampled frames.
    A boundary is declared between frames i, i+1 when the change score
    exceeds max(threshold, median + adaptive_k * MAD) — median/MAD so the
    boundaries themselves don't inflate the threshold."""
    if len(frames) < 2:
        if len(frames) == 1:
            return [(float(pts[0]), float(pts[0]))]
        return []
    scores = np.asarray(frame_change_scores(jnp.asarray(frames)))
    med = float(np.median(scores))
    mad = float(np.median(np.abs(scores - med)))
    thr = max(threshold, med + adaptive_k * max(mad, 1e-4))
    boundaries = np.where(scores > thr)[0]  # boundary after frame i
    spans = []
    start = 0
    for b in boundaries:
        spans.append((float(pts[start]), float(pts[b])))
        start = b + 1
    spans.append((float(pts[start]), float(pts[len(frames) - 1])))
    return spans


def detect_shots_for_project(project_dir, feature_id: str = None,
                             threshold: float = 0.2) -> int:
    """Decode every video in the project at the configured fps and populate
    the shots table. Returns number of shots written."""
    from .. import db as wdb
    from ..io.dataset import get_dataset
    from ..data_models import MediaType
    from ..project import WiseProject

    project = WiseProject(project_dir)
    cfg = project.load_config()
    conn = wdb.connect(project.db_path)
    conn.executescript(SHOTS_SCHEMA)
    rows = conn.execute(
        "SELECT m.id, m.path, s.location FROM media m "
        "JOIN source_collections s ON m.source_collection_id = s.id "
        "WHERE m.media_type IN ('VIDEO','AV')"
    ).fetchall()
    total = 0
    for row in rows:
        path = f"{row['location']}/{row['path']}"
        frames_all, pts_all = [], []
        ds = get_dataset(MediaType.VIDEO, [path], video=cfg.video)
        for _, chunk in ds:
            frames_all.append(chunk["video"].tensor)
            pts_all.append(chunk["video"].pts)
        if not frames_all:
            continue
        frames = np.concatenate(frames_all)
        pts = np.concatenate(pts_all)
        conn.execute("DELETE FROM shots WHERE media_id = ?", (row["id"],))
        for start, end in detect_shots(frames, pts, threshold):
            conn.execute(
                "INSERT INTO shots (media_id, start_time, end_time) "
                "VALUES (?,?,?)",
                (row["id"], start, end),
            )
            total += 1
    conn.commit()
    conn.close()
    logger.info(f"wrote {total} shots for {len(rows)} videos")
    return total
