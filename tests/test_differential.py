"""Engine-vs-engine differential: every grid must answer every query with
the same document set (the reference's --debug-diff pairwise comparison,
``apps/mainq.cpp:399-482``)."""

import pytest

QUERIES = [
    "join / window",
    "dup + spark",
    "join - dup",
    "(join + dup) / window - spark",
    "$region:1 / dup",
    "$poly:concave_c + $region:6",
]

GRIDS = [("s2", 10), ("zxy", 9), ("h3", 5), ("htm", 9)]


@pytest.mark.parametrize("q", QUERIES)
def test_all_grids_agree(engine, q):
    results = {}
    for grid, res in GRIDS:
        p = engine.planner(grid, res)
        results[grid] = frozenset(r.doc_id for r in p.docs(q).collect())
    assert results["s2"] == results["zxy"] == results["h3"] == results["htm"], {
        g: len(v) for g, v in results.items()
    }
