import numpy as np

from wise_tpu.eval.retrieval import (
    calculate_mAP,
    hhmmss_to_sec,
    segment_iou_overlap,
)


def test_hhmmss():
    assert hhmmss_to_sec("00:00:12.300") == 12.3
    assert hhmmss_to_sec("01:02:03") == 3723.0


def test_iou_overlap():
    assert segment_iou_overlap([0, 4], [2, 6], 0.1)
    assert not segment_iou_overlap([0, 4], [4.1, 8], 0.1)


def test_map_perfect_ranking():
    # 2 queries, 4 docs; perfect ranking -> mAP 1
    sim = np.array([[0.9, 0.8, 0.1, 0.0], [0.1, 0.0, 0.9, 0.8]])
    rel = np.array([[1, 1, 0, 0], [0, 0, 1, 1]])
    assert calculate_mAP(sim, rel) == 1.0


def test_map_known_value():
    # single query: relevant docs at ranks 1 and 3 -> AP = (1/1 + 2/3)/2
    sim = np.array([[0.9, 0.5, 0.4]])
    rel = np.array([[1, 0, 1]])
    expected = (1.0 + 2.0 / 3.0) / 2.0
    assert abs(calculate_mAP(sim, rel) - expected) < 1e-9
