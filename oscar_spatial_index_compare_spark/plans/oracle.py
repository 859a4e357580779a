"""DuckDB-oracle SQL generation for op-tree queries.

Mirrors the planner node-for-node in plain ANSI SQL over the raw
``documents`` table (the driver's correctness harness runs these
side-by-side with the Spark plans).  The compositional invariant that makes
flattened CQR algebra equal doc-set algebra —

    node.docs(C) = docs(node) ∩ docs-in-C   for every cell C

— holds inductively for every operator (leaves by construction; set ops by
the fm/pm case analysis; proof sketch in tests/test_optree.py), so the
oracle lowers each node to doc-set INTERSECT/UNION/EXCEPT and FM_CONVERSION
to the "docs sharing a cell with child docs" query.  This replicates the
reference's differential verification against OSCAR's original cell index
(``apps/main.cpp:193-205``) with DuckDB in the oracle seat.
"""

from __future__ import annotations

from ..grids.zxy import ZXY
from ..sources.gazetteer import gazetteer_values_sql
from ..sources.regions import region_by_id, region_by_name
from .optree import Node, parse

_MENTIONS_CTE = f"""mentions AS (
  SELECT d.doc_id, g.name, g.lat, g.lon
  FROM documents d
  JOIN {gazetteer_values_sql()}
    ON contains(' ' || d.text || ' ', ' ' || g.name || ' ')
)"""


def _token_sql(pat: str, qt: str) -> str:
    if qt == "exact":
        cond = f"list_contains(string_split(text, ' '), '{pat}')"
    elif qt == "prefix":
        cond = f"len(list_filter(string_split(text, ' '), t -> t LIKE '{pat}%')) > 0"
    elif qt == "suffix":
        cond = f"len(list_filter(string_split(text, ' '), t -> t LIKE '%{pat}')) > 0"
    else:  # substring
        cond = f"len(list_filter(string_split(text, ' '), t -> t LIKE '%{pat}%')) > 0"
    return f"SELECT DISTINCT doc_id FROM documents WHERE {cond}"


def _docs_sql(n: Node, res: int) -> str:
    cell = ZXY.cell_sql("m.lat", "m.lon", res)
    if n.op == "token":
        return _token_sql(*n.args)
    if n.op in ("region", "poly"):
        from ..functions.geo import pip_sql

        poly = region_by_id(n.args[0]) if n.op == "region" else region_by_name(n.args[0])
        return (
            "SELECT DISTINCT doc_id FROM mentions m WHERE "
            + pip_sql("m.lat", "m.lon", poly)
        )
    if n.op == "cell":
        return f"SELECT DISTINCT doc_id FROM mentions m WHERE {cell} = {n.args[0]}"
    if n.op == "fm":
        child = _docs_sql(n.args[0], res)
        return (
            f"SELECT DISTINCT m.doc_id FROM mentions m WHERE {cell} IN ("
            f"SELECT DISTINCT {cell} FROM mentions m WHERE m.doc_id IN ({child}))"
        )
    l = _docs_sql(n.args[0], res)
    r = _docs_sql(n.args[1], res)
    if n.op == "union":
        return f"SELECT * FROM ({l}) UNION SELECT * FROM ({r})"
    if n.op == "inter":
        return f"SELECT * FROM ({l}) INTERSECT SELECT * FROM ({r})"
    if n.op == "diff":
        return f"SELECT * FROM ({l}) EXCEPT SELECT * FROM ({r})"
    if n.op == "sym":
        return (
            f"SELECT * FROM (SELECT * FROM ({l}) UNION SELECT * FROM ({r})) "
            f"EXCEPT SELECT * FROM (SELECT * FROM ({l}) INTERSECT SELECT * FROM ({r}))"
        )
    raise ValueError(n.op)


def optree_oracle_sql(query: str, res: int = 9) -> str:
    """Op-tree query string → DuckDB SQL returning the flattened doc set.

    ``res`` is the zxy resolution the Spark side runs at — FM_CONVERSION and
    $cell leaves are only oracle-expressible on the zxy grid (pure floor
    math); pure set-op trees are grid-independent.
    """
    ast = parse(query)
    return f"WITH {_MENTIONS_CTE}\nSELECT doc_id FROM ({_docs_sql(ast, res)})"
