"""HCQR invariants + HCQR-vs-CQR differential (SURVEY M6, §5 mechanism 1).

Reference analog: the --debug-diff pairwise engine comparison
(``apps/mainq.cpp:399-482``) — here HCQR results must equal flat-CQR results
query-for-query, and compactification must preserve items()
(``src/static-htm-index.cpp:359-362`` compactified trees answer identically).
"""

import pytest

from oscar_spatial_index_compare_spark.operators.hcqr import (
    hcqr_from_cqr,
    hcqr_items,
    hcqr_stats,
)

QUERIES = [
    "join",
    "jo*",
    "join / window",
    "dup + spark",
    "join - dup",
    "$region:1 / dup",
    "($region:2 - $region:1) / join",
    "!dup / spark",
]


@pytest.mark.parametrize("grid,res", [("s2", 10), ("zxy", 9)])
@pytest.mark.parametrize("q", QUERIES)
def test_hcqr_matches_cqr(engine, q, grid, res):
    p = engine.planner(grid, res)
    cqr_docs = {r.doc_id for r in p.docs(q).collect()}
    hdocs = {r.doc_id for r in p.hcqr_docs(q).collect()}
    assert hdocs == cqr_docs, f"{grid} {q}: hcqr {len(hdocs)} vs cqr {len(cqr_docs)}"


@pytest.mark.parametrize("grid,res", [("s2", 10), ("zxy", 9), ("h3", 5)])
def test_compactify_preserves_items_and_normal_form(engine, grid, res):
    p = engine.planner(grid, res)
    ctx = p.ctx
    c = p.cqr("join")
    h = hcqr_from_cqr(c, grid, res, ctx.ctotals)
    rows = h.collect()
    # normal form: no row has an fm ancestor among the rows
    from oscar_spatial_index_compare_spark.grids.base import get_grid
    import numpy as np

    g = get_grid(grid)
    fm = [(r.pixel_id, r.level) for r in rows if r.is_fm]
    fmset = set(fm)
    for r in rows:
        cur = np.array([r.pixel_id])
        for lvl in range(r.level - 1, -1, -1):
            cur = g.parent(cur, lvl)
            assert (int(cur[0]), lvl) not in fmset, "fm ancestor present"
    # items preserved
    from oscar_spatial_index_compare_spark.operators.cqr import cqr_flatten

    items_h = {r.doc_id for r in hcqr_items(h, ctx.ctotals, grid, res, ctx.spark).collect()}
    items_c = {r.doc_id for r in cqr_flatten(c, ctx.ctotals).collect()}
    assert items_h == items_c
    # compaction actually happened for a common token at coarse-ish res
    n_leaves = sum(1 for r in rows if r.level == res)
    assert len(rows) <= c.count()


@pytest.mark.parametrize("grid,res", [("s2", 10)])
def test_hcqr_stats_shape(engine, grid, res):
    p = engine.planner(grid, res)
    h = p.hcqr("join")
    s = hcqr_stats(h, grid, res).collect()[0]
    assert s.depth <= res + 1
    assert s.n_nodes >= s.n_leaves
    assert s.n_fm >= 0 and s.pm_items >= 0


def test_hcqr_symdiff_unsupported(engine):
    p = engine.planner("s2", 10)
    with pytest.raises(NotImplementedError):
        p.hcqr("join ^ dup")


@pytest.mark.parametrize("q", ["join - dup", "($region:2 - $region:1) / join",
                               "!($region:1) - spark"])
def test_difference_distributed_fallback_matches(engine, q, monkeypatch):
    """Adversarially force the overlap-pair cap to 0: every difference takes
    the distributed leaf-expansion path; results must equal the driver-side
    decomposition AND the flat CQR answer (r01 VERDICT item 7)."""
    from oscar_spatial_index_compare_spark.operators import hcqr as hc

    p = engine.planner("s2", 10)
    normal = {r.doc_id for r in p.hcqr_docs(q).collect()}
    monkeypatch.setattr(hc, "MAX_DRIVER_OVERLAP_PAIRS", 0)
    forced = {r.doc_id for r in p.hcqr_docs(q).collect()}
    assert forced == normal
    cqr_docs = {r.doc_id for r in p.docs(q).collect()}
    assert forced == cqr_docs
