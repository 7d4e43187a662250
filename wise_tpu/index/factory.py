"""SearchIndex factory (reference contract:
/root/reference/src/index/search_index_factory.py:4-21): audio/video/image
-> FeatureSearchIndex; metadata -> SqliteSearchIndex."""

from __future__ import annotations

from .feature_index import FeatureSearchIndex
from .fts_index import SqliteSearchIndex


def SearchIndexFactory(media_type: str, asset_id: str, asset: dict, config=None):
    if media_type in ("audio", "video", "image"):
        return FeatureSearchIndex(media_type, asset_id, asset, config=config)
    if media_type == "metadata":
        return SqliteSearchIndex(media_type, asset_id, asset, config=config)
    raise ValueError(f"unknown media_type {media_type}")
