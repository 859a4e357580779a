"""kNN document search via cell-ring expansion (SURVEY X2).

The reference stubs NEAR queries (``src/OscarSearchWithSg.cpp:167-181``);
the north star mandates kNN via cell-ring expansion with a per-partition
bounded heap.

Algorithm (per query point, batched across queries):
  1. seed = hex cell of the query point at ``res``;
  2. candidate cells = ``grid_disk(seed, r)`` with r doubling 2,4,8,…;
     candidates are broadcast and hash-joined against ``mention_cells`` —
     the big side never shuffles;
  3. per-partition bounded top-k (mapInPandas + np.argpartition — the
     bounded heap), then global top-k;
  4. termination proof: any mention outside disk(r) is at planar degree
     distance ≥ (r-0.5)·s·√3/2 from the query; ``_km_lower_bound`` converts
     that to a great-circle km bound that accounts for longitude shrink at
     high latitude.  Expansion stops when kth-dist < bound (else doubles).

Doc distance = min over its mentions; k docs per query, ties broken by
doc_id; distances quantized to integer meters for cross-engine equality
(functions/geo.dist_m_col — same formula as the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.geo import dist_m_col, dist_m_sql, haversine_col, haversine_sql
from ..grids.base import get_grid
from ..grids.hex7 import SQRT3, _frame

KM_PER_DEG = 111.19492664455873  # great-circle km per degree (min over lat)


def _km_lower_bound(qlat: float, d_deg: float) -> float:
    """Lower bound on great-circle km to any point ≥ d_deg planar degrees away.

    Split d_deg = a (lat) + b (lon): km ≥ KM_PER_DEG · max(a, b·cos(|qlat|+a));
    the adversary minimizes over a — evaluate on a fine grid.
    """
    a = np.linspace(0.0, d_deg, 512)
    b = d_deg - a
    lat = np.minimum(np.abs(qlat) + a, 90.0)
    val = np.maximum(a, b * np.cos(np.radians(lat)))
    return float(KM_PER_DEG * val.min())


def _partial_topk(per_doc: DataFrame, max_k: int) -> DataFrame:
    """Per-partition bounded heap (north_star): keep only the max_k best
    (dist, doc) rows per query within each partition before the global
    shuffle — mapInPandas + np.argpartition, Arrow-batched."""
    schema = per_doc.schema

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            parts = []
            for _, grp in pdf.groupby("query_id", sort=False):
                if len(grp) > max_k:
                    # lexsort keeps the (dist, doc_id) tie-break exact
                    order = np.lexsort(
                        (grp["doc_id"].to_numpy(), grp["dist_m"].to_numpy())
                    )[:max_k]
                    grp = grp.iloc[np.sort(order)]
                parts.append(grp)
            yield pd.concat(parts, ignore_index=True)

    return per_doc.mapInPandas(fn, schema)


def knn_docs(
    spark: SparkSession,
    mcells: DataFrame,
    queries: list[tuple[int, float, float, int]],
    grid: str = "h3",
    res: int = 5,
    max_r: int = 512,
) -> DataFrame:
    """queries: [(query_id, lat, lon, k)] → (query_id, doc_id, dist_m, rank).

    ``mcells``: mention_cells at (grid, res).  Returns exactly k rows per
    query (fewer only if the corpus has fewer docs).
    """
    g = get_grid(grid)
    s, _ = _frame(res)
    probe = mcells.where((F.col("grid") == grid) & (F.col("res") == res)).select(
        "doc_id", "lat", "lon", "cell_id"
    )

    pending = {qid: (lat, lon, k) for qid, lat, lon, k in queries}
    results = {}
    r = 2
    while pending and r <= max_r:
        cand_rows = []
        for qid, (qlat, qlon, k) in pending.items():
            seed = int(g.cell(np.array([qlat]), np.array([qlon]), res)[0])
            for c in g.disk(seed, r).tolist():
                cand_rows.append((qid, int(c)))
        cand = F.broadcast(
            spark.createDataFrame(cand_rows, "query_id long, cand_cell long")
        )
        qdf = F.broadcast(
            spark.createDataFrame(
                [(qid, v[0], v[1], v[2]) for qid, v in pending.items()],
                "query_id long, qlat double, qlon double, k int",
            )
        )
        j = (
            probe.join(cand, probe.cell_id == cand.cand_cell)
            .join(qdf, "query_id")
            .withColumn(
                "dist_m",
                dist_m_col(
                    haversine_col(F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon"))
                ),
            )
        )
        # doc distance = min over mentions, then top-k per query
        per_doc = j.groupBy("query_id", "doc_id", "k").agg(F.min("dist_m").alias("dist_m"))
        max_k = max(k for _, _, k in pending.values())
        per_doc = _partial_topk(per_doc, max_k)  # bounded heap per partition
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("doc_id").asc())
        topk = (
            per_doc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "doc_id", "dist_m", "rank", "k")
        )
        rows = topk.collect()
        by_q: dict[int, list] = {}
        for row in rows:
            by_q.setdefault(row.query_id, []).append(row)
        for qid in by_q:
            by_q[qid].sort(key=lambda x: x.rank)
        done = []
        for qid, (qlat, qlon, k) in pending.items():
            got = by_q.get(qid, [])
            bound_km = _km_lower_bound(qlat, (r - 0.5) * s * SQRT3 / 2.0)
            kth_km = got[-1].dist_m / 1000.0 if len(got) >= k else float("inf")
            if len(got) >= k and kth_km < bound_km:
                results[qid] = [(qid, x.doc_id, x.dist_m, x.rank) for x in got]
                done.append(qid)
        for qid in done:
            del pending[qid]
        r *= 2
    if pending:
        # bounded corpus fallback: exact scan for the stragglers (still the
        # correct answer; at 100 TB this only triggers for k ≫ local density)
        qdf = F.broadcast(
            spark.createDataFrame(
                [(qid, v[0], v[1], v[2]) for qid, v in pending.items()],
                "query_id long, qlat double, qlon double, k int",
            )
        )
        j = probe.crossJoin(qdf).withColumn(
            "dist_m",
            dist_m_col(haversine_col(F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon"))),
        )
        per_doc = j.groupBy("query_id", "doc_id", "k").agg(F.min("dist_m").alias("dist_m"))
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("doc_id").asc())
        rows = (
            per_doc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .collect()
        )
        for row in rows:
            results.setdefault(row.query_id, []).append(
                (row.query_id, row.doc_id, row.dist_m, row.rank)
            )
    flat = [t for rs in results.values() for t in rs]
    return spark.createDataFrame(
        flat, "query_id long, doc_id long, dist_m long, rank int"
    )


def knn_oracle_sql(queries: list[tuple[int, float, float, int]]) -> str:
    """Brute-force DuckDB twin: full haversine sort per query."""
    from ..sources.gazetteer import mentions_subquery_sql

    parts = []
    for qid, qlat, qlon, k in queries:
        d = dist_m_sql(haversine_sql(repr(qlat), repr(qlon), "m.lat", "m.lon"))
        parts.append(f"""
SELECT * FROM (
  SELECT {qid} AS query_id, doc_id, dist_m,
         CAST(ROW_NUMBER() OVER (ORDER BY dist_m ASC, doc_id ASC) AS INT) AS rank
  FROM (
    SELECT m.doc_id, MIN({d}) AS dist_m
    FROM {mentions_subquery_sql()} m
    GROUP BY m.doc_id
  )
) WHERE rank <= {k}""")
    return "\nUNION ALL\n".join(parts)
