"""Temporal merge semantics (reference: search.py:161-445)."""

import pytest

from wise_tpu.search.results import (
    apply_subtract,
    does_segment_overlap,
    merge0,
    merge1,
    merge_a_ranked_result_list,
    result_to_csv_lines,
)


class TestOverlap:
    def test_point_in_segment(self):
        assert does_segment_overlap(1.5, [1.0, 2.0])
        assert not does_segment_overlap(2.5, [1.0, 2.0])

    def test_segment_overlap_iou(self):
        assert does_segment_overlap([0.0, 4.0], [3.0, 7.0])
        assert not does_segment_overlap([0.0, 4.0], [4.0, 8.0])  # iou ~0
        assert not does_segment_overlap([0.0, 4.0], [8.0, 12.0])

    def test_point_vs_point(self):
        assert does_segment_overlap(1.0, 1.0)
        assert not does_segment_overlap(1.0, 2.0)


def test_merge_ranked_list_basic():
    # two adjacent hits in the same file merge into one span
    f, p, s, r = merge_a_ranked_result_list(
        ["a.mp4", "a.mp4", "b.mp4"],
        [0.5, 2.0, 1.0],
        [0.9, 0.8, 0.7],
        pts_tolerance=4.0,
        rank_tolerance=20,
    )
    assert f == ["a.mp4", "b.mp4"]
    assert p == [[0.5, 2.0], [1.0]]
    assert s == [0.9, 0.7]
    assert r == [[0, 1], [2]]


def test_merge_ranked_list_respects_tolerances():
    # same file but far apart in time -> no merge
    f, p, s, r = merge_a_ranked_result_list(
        ["a.mp4", "a.mp4"], [0.0, 100.0], [0.9, 0.8], 4.0, 20
    )
    assert f == ["a.mp4", "a.mp4"]
    # same file, close in time but far in rank -> no merge
    names = ["a.mp4"] + ["b%d.mp4" % i for i in range(25)] + ["a.mp4"]
    pts = [0.0] + [float(i) for i in range(25)] + [1.0]
    scores = [1.0] * 27
    f, p, s, r = merge_a_ranked_result_list(names, pts, scores, 4.0, 20)
    assert f.count("a.mp4") == 2


def test_merge0_image_never_merges():
    results = [
        {
            "match_filename_list": ["x.jpg", "x.jpg"],
            "match_pts_list": [0.0, 0.0],
            "match_score_list": [0.9, 0.8],
            "in": ["image"],
            "query": ["cat"],
            "not_in": [],
        }
    ]
    out = merge0(results)
    # image tolerances are 0/0: distinct ranks never satisfy |i-j| <= 0, so
    # nothing merges (reference semantics, search.py:258-261)
    assert len(out[0]["match_filename_list"]) == 2


def test_merge1_cross_modal_and():
    r0 = {
        "match_filename_list": ["a.mp4", "b.mp4"],
        "match_pts_list": [[0.0, 4.0], [0.0, 4.0]],
        "match_score_list": [0.5, 0.4],
        "query": ["cooking"],
        "in": ["video"],
        "not_in": [],
        "search_time_sec": 0.1,
    }
    r1 = {
        "match_filename_list": ["a.mp4", "c.mp4"],
        "match_pts_list": [[2.0, 6.0], [0.0, 4.0]],
        "match_score_list": [0.3, 0.2],
        "query": ["music"],
        "in": ["audio"],
        "not_in": [],
        "search_time_sec": 0.1,
    }
    out = merge1([r0, r1])
    assert len(out) == 1
    m = out[0]
    assert m["match_filename_list"] == ["a.mp4"]
    assert m["match_score_list"][0] == pytest.approx(0.8)
    assert m["match_pts_list"][0] == [0.0, 6.0]
    assert m["query"] == ["cooking", "music"]
    assert m["in"] == ["video", "audio"]


def test_apply_subtract():
    r = {
        "match_filename_list": ["a.mp4", "b.mp4"],
        "match_pts_list": [[0.0, 4.0], [0.0, 4.0]],
        "match_score_list": [0.5, 0.4],
        "query": ["q"],
        "in": ["video"],
        "not_in": [],
    }
    nr = {
        "match_filename_list": ["a.mp4"],
        "match_pts_list": [[1.0, 3.0]],
        "match_score_list": [0.9],
    }
    out = apply_subtract(r, nr)
    assert out["match_filename_list"] == ["b.mp4"]
    assert out["match_score_list"] == [0.4]


def test_csv_lines_format():
    results = [
        {
            "match_filename_list": ["a.mp4"],
            "match_pts_list": [[0.0, 8.5]],
            "match_score_list": [0.10234],
            "query": ["cooking"],
            "in": ["video"],
            "not_in": [],
        }
    ]
    lines = result_to_csv_lines(results)
    # exact contract: quoted title with CSV-doubled quotes, rank, filename,
    # start, end, score to 3 decimals (reference: search.py:511-539)
    assert lines[0] == '"""cooking"" in video",0,"a.mp4",0.0,8.5,0.102'


def test_table_lines_human_readable():
    from wise_tpu.search.results import result_to_table_lines, to_hhmmss

    assert to_hhmmss(96.5) == "00:01:36.50"
    assert to_hhmmss(3661.25) == "01:01:01.25"
    results = [
        {
            "match_filename_list": ["a.mp4"],
            "match_pts_list": [[96.5, 100.0]],
            "match_score_list": [0.5],
            "merged_rank_list": [[0]],
            "query": ["x"],
            "in": ["video"],
            "not_in": [],
            "search_time_sec": 0.01,
        }
    ]
    lines = result_to_table_lines(results, human_readable=True)
    assert any("00:01:36.50 - 00:01:40.00" in l for l in lines)
