"""Parse-tree contract tests for the audiovisual query grammar.

The expected trees pin the same public grammar the reference implements
(docs/Grammar-of-Audiovisual-Search.md); expectations here are constructed
via a small builder instead of literal tables.
"""

import pytest

from wise_tpu.search import parse_search_query


def unit(strs, types=None, ops=(), target="video", link="in"):
    return {
        "query_str": list(strs),
        "query_type": list(types) if types else ["text"] * len(strs),
        "query_embedding_vec_op": list(ops),
        "search_target": target,
        "search_target_link": link,
    }


def tree(cmd, units, merges=()):
    return {"cmd": cmd, "query": units, "query_result_merge_ops": list(merges)}


CASES = [
    (
        "cooking food in video",
        [unit(["cooking food"])],
        (),
    ),
    (
        "car not in metadata",
        [unit(["car"], target="metadata", link="not in")],
        (),
    ),
    (
        '"cooking" in VIDEO AND "music" in AUDIO',
        [unit(['"cooking"']), unit(['"music"'], target="audio")],
        ("and",),
    ),
    (
        'cooking IN VIDEO AND "background music" IN AUDIO or singing NOT IN metadata',
        [
            unit(["cooking"]),
            unit(['"background music"'], target="audio"),
            unit(["singing"], target="metadata", link="not in"),
        ],
        ("and", "or"),
    ),
    (
        '@dog.jpg + "in snow" IN VIDEO',
        [unit(["dog.jpg", '"in snow"'], types=["file", "text"], ops=["+"])],
        (),
    ),
    (
        'animal - @cat.jpg IN Video and "wildlife safari" in MetaData',
        [
            unit(["animal", "cat.jpg"], types=["text", "file"], ops=["-"]),
            unit(['"wildlife safari"'], target="metadata"),
        ],
        ("and",),
    ),
]


@pytest.mark.parametrize("cmd,units,merges", CASES, ids=[c[0] for c in CASES])
def test_parse_tree(cmd, units, merges):
    status, parsed = parse_search_query(cmd)
    assert status["status"] == "OK"
    assert parsed == tree(cmd, units, merges)


@pytest.mark.parametrize(
    "bad",
    ["", "cooking in nowhere", "in video", '"unbalanced in video', "+ in video"],
)
def test_errors(bad):
    status, parsed = parse_search_query(bad)
    assert status["status"] == "ERROR"
    assert parsed == {}
