from .search_index import SearchIndex
from .feature_index import FeatureSearchIndex
from .fts_index import SqliteSearchIndex
from .factory import SearchIndexFactory

__all__ = [
    "SearchIndex",
    "FeatureSearchIndex",
    "SqliteSearchIndex",
    "SearchIndexFactory",
]
