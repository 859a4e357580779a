"""Region (polygon) queries: polyfill + exact PIP refinement (SURVEY X1).

The reference stubs polygon leaves (``src/OscarSearchWithSg.cpp:167-181``,
UnsupportedFeature) but the north star mandates them.  Plan shape:

    covering(poly, res)  →  full cells (possibly coarser levels)
                         →  boundary cells (exactly res)

    docs = ( mention_cells ⋈ full-cell ranges )          -- no PIP needed
          ∪ ( mention_cells ⋈ boundary cells → exact PIP )
    distinct doc_id

Scale notes:
  * the covering is computed driver-side (numpy, ≤ tens of thousands of
    cells) and **broadcast**; the probe side is the bucketed
    ``mention_cells`` table, so the join is a broadcast hash/range join with
    zero shuffle of the big side.
  * for s2, full cells at coarser levels join via contiguous id **ranges**
    (cell_id BETWEEN lo AND hi) — parquet/Iceberg min-max stats prune files;
    for hex/zxy, full coverings are emitted at the query res so equality
    joins suffice.
  * exact PIP (pip_col) runs only on boundary candidates — the same
    full-match short-cut the reference gets from fm-cell lists
    (``src/OscarSearchSgIndex.cpp:117-130``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import pip_col
from ..grids.base import get_grid

_COVERING_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def cached_covering(grid_name: str, poly: np.ndarray, res: int):
    """Coverings are deterministic functions of (grid, polygon, res) and are
    computed serially on the driver — memoize them (repeated queries over
    the same regions are the common case; this is the query-plan cache)."""
    key = (grid_name, res, poly.tobytes())
    if key not in _COVERING_CACHE:
        _COVERING_CACHE[key] = get_grid(grid_name).covering(poly, res)
    return _COVERING_CACHE[key]


def region_query_docs(
    spark: SparkSession,
    mcells: DataFrame,
    poly: np.ndarray,
    grid: str = "s2",
    res: int = 10,
) -> DataFrame:
    """→ DataFrame(doc_id) of documents with ≥1 mention inside ``poly``.

    ``mcells``: mention_cells for (grid, res) — cell_id per mention.
    """
    g = get_grid(grid)
    full, boundary = cached_covering(grid, poly, res)

    probe = mcells.where((F.col("grid") == grid) & (F.col("res") == res))

    parts: list[DataFrame] = []
    if len(full):
        if grid == "s2":
            lo, hi = g.range_bounds(full)
            ranges = spark.createDataFrame(
                [(int(a), int(b)) for a, b in zip(lo, hi)], "lo long, hi long"
            )
            parts.append(
                probe.join(
                    F.broadcast(ranges),
                    (F.col("cell_id") >= F.col("lo")) & (F.col("cell_id") <= F.col("hi")),
                ).select("doc_id")
            )
        else:
            # hex/zxy coverings may also emit coarser fulls → expand via parent
            from ..functions.udfs import parent_col
            lvls = g.level(full)
            for lvl in np.unique(lvls):
                cells = [int(c) for c in full[lvls == lvl]]
                cdf = F.broadcast(spark.createDataFrame([(c,) for c in cells], "fcell long"))
                if int(lvl) == res:
                    parts.append(probe.join(cdf, F.col("cell_id") == F.col("fcell")).select("doc_id"))
                else:
                    anc = probe.withColumn(
                        "anc", parent_col(grid, F.col("cell_id"), int(lvl), from_res=res)
                    )
                    parts.append(anc.join(cdf, F.col("anc") == F.col("fcell")).select("doc_id"))
    if len(boundary):
        bdf = F.broadcast(
            spark.createDataFrame([(int(c),) for c in boundary], "bcell long")
        )
        cand = probe.join(bdf, F.col("cell_id") == F.col("bcell"))
        parts.append(
            cand.where(pip_col(F.col("lat"), F.col("lon"), poly)).select("doc_id")
        )
    if not parts:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["doc_id"])


def region_query_oracle_sql(poly: np.ndarray) -> str:
    """Brute-force oracle: doc has a gazetteer mention strictly inside poly."""
    from ..functions.geo import pip_sql
    from ..sources.gazetteer import mentions_subquery_sql

    return f"""
SELECT DISTINCT m.doc_id
FROM {mentions_subquery_sql()} m
WHERE {pip_sql('m.lat', 'm.lon', poly)}
"""
