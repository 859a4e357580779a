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

# populated-cell lists below this size are collected once per table and used
# to prune coverings driver-side (exact, not heuristic); above it region
# queries fall back to distributed per-level ancestor equi-joins.  6*4^10
# s2 cells ≈ 6.3M, so res-10 indexes always qualify; very deep resolutions
# at 100 TB take the distributed path.
MAX_DRIVER_POP_CELLS = 4_000_000

# Entries HOLD the source DataFrame: keys embed id(df), and a live reference
# guarantees CPython never reuses that id for a different table (ADVICE/
# VERDICT r02 aliasing hazard).  Bounded FIFO — an evicted entry's id can
# recycle safely because the entry is gone.
_POP_CACHE: dict[tuple, tuple[DataFrame, np.ndarray | None]] = {}
_POP_CACHE_CAP = 64


def cached_covering(grid_name: str, poly: np.ndarray, res: int):
    """Coverings are deterministic functions of (grid, polygon, res) and are
    computed serially on the driver — memoize them (repeated queries over
    the same regions are the common case; this is the query-plan cache)."""
    key = (grid_name, res, poly.tobytes())
    if key not in _COVERING_CACHE:
        _COVERING_CACHE[key] = get_grid(grid_name).covering(poly, res)
    return _COVERING_CACHE[key]


# largest pruned covering worth shipping from the driver as a broadcast
# list; above it the distributed per-level equi-join path wins
MAX_BROADCAST_CELLS = 200_000


def cells_df(spark: SparkSession, arr, colname: str) -> DataFrame:
    """int64 array → single-column DataFrame via Arrow (fast for 10^5 rows)."""
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({colname: np.asarray(arr, np.int64)})
    )


def populated_cells(df: DataFrame, key: tuple,
                    source: DataFrame | None = None) -> np.ndarray | None:
    """Sorted distinct ``cell_id`` values of ``df`` — the engine's analog of
    the reference intersecting a covering with its cell list
    (``src/OscarSearchSgIndex.cpp:117-130``).  Memoized per (table, grid,
    res); returns None above MAX_DRIVER_POP_CELLS (distributed fallback).
    ``source`` is the DataFrame whose id() is embedded in ``key`` (held
    alive by the entry to keep the key valid); defaults to ``df``.
    """
    if key not in _POP_CACHE:
        rows = (
            df.select("cell_id").dropDuplicates()
            .limit(MAX_DRIVER_POP_CELLS + 1).collect()
        )
        if len(_POP_CACHE) >= _POP_CACHE_CAP:
            _POP_CACHE.pop(next(iter(_POP_CACHE)))
        if len(rows) > MAX_DRIVER_POP_CELLS:
            _POP_CACHE[key] = (source if source is not None else df, None)
        else:
            _POP_CACHE[key] = (
                source if source is not None else df,
                np.sort(np.array([r[0] for r in rows], np.int64)),
            )
    return _POP_CACHE[key][1]


def expand_full_to_populated(
    grid: str, full: np.ndarray, pop: np.ndarray, res: int
) -> np.ndarray:
    """Full covering cells (mixed levels) → the POPULATED res-level cells
    they contain, via vectorized parent matching on the driver.  Exact: a
    dropped cell provably holds no documents."""
    g = get_grid(grid)
    lvls = g.level(full)
    outs = []
    for lvl in np.unique(lvls):
        cells = full[lvls == lvl]
        if int(lvl) == res:
            outs.append(cells[np.isin(cells, pop)])
        else:
            anc = g.parent(pop, int(lvl))
            outs.append(pop[np.isin(anc, cells)])
    if not outs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(outs))


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
    pop = populated_cells(probe, (id(mcells), grid, res), source=mcells)

    parts: list[DataFrame] = []
    if pop is not None:
        # prune the covering to POPULATED cells driver-side (r01 VERDICT
        # fix: no BroadcastNestedLoopJoin, and empty coverings cost nothing)
        fulls = (
            expand_full_to_populated(grid, full, pop, res)
            if len(full) else np.empty(0, np.int64)
        )
        bnd = boundary[np.isin(boundary, pop)] if len(boundary) else boundary
        if len(fulls) + len(bnd) > MAX_BROADCAST_CELLS:
            pop = None  # pruned list too big to ship — distributed joins below
        else:
            if len(fulls):
                fdf = F.broadcast(cells_df(spark, fulls, "fcell"))
                parts.append(
                    probe.join(fdf, F.col("cell_id") == F.col("fcell")).select("doc_id")
                )
            if len(bnd):
                bdf = F.broadcast(cells_df(spark, bnd, "bcell"))
                cand = probe.join(bdf, F.col("cell_id") == F.col("bcell"))
                parts.append(
                    cand.where(pip_col(F.col("lat"), F.col("lon"), poly)).select("doc_id")
                )
    if pop is None:
        # distributed fallback (populated-cell list too big for the driver):
        # per-level ancestor EQUI-joins — broadcast hash joins, never a BNLJ
        # (parent-at-level is native bit math for s2 and zxy)
        from ..functions.udfs import parent_col
        if len(full):
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
