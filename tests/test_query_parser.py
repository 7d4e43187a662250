"""Table-driven parse-tree equality tests, mirroring the reference suite
(/root/reference/src/search/test_query_parser.py:1-183)."""

import pytest

from wise_tpu.search import parse_search_query


CASES = {
    "cooking food in video": {
        "cmd": "cooking food in video",
        "query": [
            {
                "query_str": ["cooking food"],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "video",
                "search_target_link": "in",
            }
        ],
        "query_result_merge_ops": [],
    },
    "car not in metadata": {
        "cmd": "car not in metadata",
        "query": [
            {
                "query_str": ["car"],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "metadata",
                "search_target_link": "not in",
            }
        ],
        "query_result_merge_ops": [],
    },
    '"cooking" in VIDEO AND "music" in AUDIO': {
        "cmd": '"cooking" in VIDEO AND "music" in AUDIO',
        "query": [
            {
                "query_str": ['"cooking"'],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "video",
                "search_target_link": "in",
            },
            {
                "query_str": ['"music"'],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "audio",
                "search_target_link": "in",
            },
        ],
        "query_result_merge_ops": ["and"],
    },
    'cooking IN VIDEO AND "background music" IN AUDIO or singing NOT IN metadata': {
        "cmd": 'cooking IN VIDEO AND "background music" IN AUDIO or singing NOT IN metadata',
        "query": [
            {
                "query_str": ["cooking"],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "video",
                "search_target_link": "in",
            },
            {
                "query_str": ['"background music"'],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "audio",
                "search_target_link": "in",
            },
            {
                "query_str": ["singing"],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "metadata",
                "search_target_link": "not in",
            },
        ],
        "query_result_merge_ops": ["and", "or"],
    },
    '@dog.jpg + "in snow" IN VIDEO': {
        "cmd": '@dog.jpg + "in snow" IN VIDEO',
        "query": [
            {
                "query_str": ["dog.jpg", '"in snow"'],
                "query_type": ["file", "text"],
                "query_embedding_vec_op": ["+"],
                "search_target": "video",
                "search_target_link": "in",
            }
        ],
        "query_result_merge_ops": [],
    },
    'animal - @cat.jpg IN Video and "wildlife safari" in MetaData': {
        "cmd": 'animal - @cat.jpg IN Video and "wildlife safari" in MetaData',
        "query": [
            {
                "query_str": ["animal", "cat.jpg"],
                "query_type": ["text", "file"],
                "query_embedding_vec_op": ["-"],
                "search_target": "video",
                "search_target_link": "in",
            },
            {
                "query_str": ['"wildlife safari"'],
                "query_type": ["text"],
                "query_embedding_vec_op": [],
                "search_target": "metadata",
                "search_target_link": "in",
            },
        ],
        "query_result_merge_ops": ["and"],
    },
}


@pytest.mark.parametrize("cmd", list(CASES))
def test_parse_tree(cmd):
    status, tree = parse_search_query(cmd)
    assert status["status"] == "OK"
    assert tree == CASES[cmd]


@pytest.mark.parametrize(
    "bad",
    ["", "cooking in nowhere", "in video", '"unbalanced in video', "+ in video"],
)
def test_errors(bad):
    status, tree = parse_search_query(bad)
    assert status["status"] == "ERROR"
    assert tree == {}
