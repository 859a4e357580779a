"""Grid-kernel invariants (SURVEY M1) — pure numpy, no Spark.

Mirrors the reference's build-time invariant assertions
(``SSERIALIZE_EXPENSIVE_ASSERT`` blocks, ``src/OscarSgIndex.cpp:134-146``)
as property tests over the three grid implementations.
"""

import numpy as np
import pytest

from oscar_spatial_index_compare_spark.grids.base import get_grid, point_in_poly

RNG = np.random.default_rng(42)
LAT = RNG.uniform(-89, 89, 5000)
LON = RNG.uniform(-180, 180, 5000)

CASES = [("s2", [0, 3, 10, 30]), ("h3", [0, 4, 9]), ("zxy", [0, 5, 12]), ("htm", [0, 4, 12])]


@pytest.mark.parametrize("name,levels", CASES)
def test_level_and_center_roundtrip(name, levels):
    g = get_grid(name)
    for res in levels:
        ids = g.cell(LAT, LON, res)
        assert (g.level(ids) == res).all()
        clat, clon = g.center(ids)
        assert (g.cell(clat, clon, res) == ids).all()


@pytest.mark.parametrize("name,levels", CASES)
def test_parent_is_ancestor(name, levels):
    g = get_grid(name)
    res = levels[-1]
    coarse = max(levels[0], res - 3)
    ids = g.cell(LAT, LON, res)
    p = g.parent(ids, coarse)
    assert (g.level(p) == coarse).all()
    assert g.is_ancestor(p, ids).all()
    # parent chain consistency: parent(parent(x)) == parent(x, l-2)
    if res - 2 >= 0:
        p1 = g.parent(g.parent(ids, res - 1), res - 2)
        p2 = g.parent(ids, res - 2)
        assert (p1 == p2).all()


@pytest.mark.parametrize("name,res", [("s2", 5), ("h3", 4), ("zxy", 6), ("htm", 5)])
def test_children_inverse(name, res):
    g = get_grid(name)
    cells = np.unique(g.cell(LAT[:500], LON[:500], res))
    ch = g.children(cells)
    for row, c in zip(ch, cells):
        kids = row[row != -1]  # hex pads with -1; s2 face-4/5 ids are negative
        assert len(kids) > 0
        assert (g.level(kids) == res + 1).all()
        assert (g.parent(kids, res) == c).all()


def test_s2_structure():
    g = get_grid("s2")
    ids = g.cell(LAT, LON, 0)
    faces = np.unique(ids.view(np.uint64) >> np.uint64(61))
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}
    # face cell ids: face << 61 | 1 << 60
    expect = {(f << 61) | (1 << 60) for f in range(4)} | {
        (4 << 61 | 1 << 60) - (1 << 64), (5 << 61 | 1 << 60) - (1 << 64)
    }
    assert set(ids.tolist()) <= expect
    # descendant ranges are contiguous and signed-compare safe
    deep = g.cell(LAT, LON, 20)
    lo, hi = g.range_bounds(g.parent(deep, 8))
    assert ((deep >= lo) & (deep <= hi)).all()


def test_hex_children_count_is_seven():
    g = get_grid("h3")
    cells = np.unique(g.cell(LAT[:300], LON[:300], 3))
    ch = g.children(cells)
    counts = (ch >= 0).sum(axis=1)
    assert (counts == 7).all()


@pytest.mark.parametrize("name,res", [("s2", 9), ("h3", 5), ("zxy", 9), ("htm", 8)])
def test_covering_conservative(name, res):
    g = get_grid(name)
    poly = np.array([[10.0, 20.0], [10.0, 40.0], [30.0, 45.0], [32.0, 18.0]])
    full, boundary = g.covering(poly, res)
    fullset, bdset = set(full.tolist()), set(boundary.tolist())
    lat = RNG.uniform(8, 34, 3000)
    lon = RNG.uniform(16, 47, 3000)
    inside = point_in_poly(lat, lon, poly)
    cells = g.cell(lat, lon, res)

    def covered(c):
        if int(c) in bdset or int(c) in fullset:
            return True
        cur = np.array([c])
        for lvl in range(res - 1, -1, -1):
            cur = g.parent(cur, lvl)
            if int(cur[0]) in fullset:
                return True
        return False

    def in_full(c):
        if int(c) in fullset:
            return True
        cur = np.array([c])
        for lvl in range(res - 1, -1, -1):
            cur = g.parent(cur, lvl)
            if int(cur[0]) in fullset:
                return True
        return False

    # completeness: every inside point is covered
    assert all(covered(c) for c in cells[inside])
    # soundness: no outside point is in a FULL cell
    assert not any(in_full(c) for c in cells[~inside])


def test_hex_disk_sizes():
    g = get_grid("h3")
    c = int(g.cell(np.array([10.0]), np.array([10.0]), 6)[0])
    for k in [1, 2, 5]:
        assert len(g.disk(c, k)) == 3 * k * (k + 1) + 1
    assert len(g.ring(c, 3)) == 18


def test_child_position_roundtrip():
    """G5 childPosition: inverse of children() order, for every grid."""
    import numpy as np
    from oscar_spatial_index_compare_spark.grids.base import get_grid

    for name in ("s2", "zxy", "h3", "htm"):
        g = get_grid(name)
        cells = g.cell(
            np.array([48.85, -33.0, 13.37]), np.array([2.35, 151.0, 179.7]), 6
        )
        ch = g.children(cells)
        for row in range(ch.shape[0]):
            kids = ch[row][ch[row] >= 0]
            pos = g.child_position(kids)
            assert list(pos) == list(range(len(kids))), (name, row, pos)
