from .extract import ExtractionStats, extract_features

__all__ = ["extract_features", "ExtractionStats"]
