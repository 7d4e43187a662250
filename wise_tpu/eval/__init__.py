from .retrieval import calculate_mAP, build_similarity_matrix

__all__ = ["calculate_mAP", "build_similarity_matrix"]
