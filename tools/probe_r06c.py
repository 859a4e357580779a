#!/usr/bin/env python
"""Third-pass r06 isolation probes (guide §1.4/§1.5): decompose the
region-single and kNN entries at driver scale.  NOT part of the frozen
driver contract (like bench_extra.py).

Env: SPARK_GRAFT_SF_DIR (default /root/scratch/sf1.0rep), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scratch/sf1.0rep")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    import numpy as np
    from pyspark.sql import functions as F

    from oscar_spatial_index_compare_spark.engine import Engine
    from oscar_spatial_index_compare_spark.operators.region_query import (
        _batch_dim, cached_covering, cells_df, expand_full_to_populated,
        populated_cells, region_query_docs,
    )
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.regions import region_by_name

    spark = get_spark(app_name="osi-probe-r06c", cores=CPUS,
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.local.dir": "/dev/shm/sparktmp"})
    out: dict[str, float] = {}

    def t(name, fn, n=1):
        best = float("inf")
        for _ in range(n):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}", flush=True)

    cat_root = tempfile.mkdtemp(prefix="probe_catalog_", dir="/dev/shm/sparktmp")
    eng = Engine(spark, SF_DIR, catalog_root=cat_root)
    t0 = time.perf_counter()
    ctx = eng.context("s2", 10)
    print(f"  build_s2: {time.perf_counter() - t0:.3f}", flush=True)
    ctx.mcells.count()

    # ---- region single decomposition ----------------------------------
    poly = region_by_name("metro")
    probe = ctx.mcells.where((F.col("grid") == "s2") & (F.col("res") == 10))

    # 1. populated-cells collect (one-time per table)
    t("pop_cells_collect", lambda: populated_cells(
        probe, (id(ctx.mcells), "s2", 10), source=ctx.mcells))
    pop = populated_cells(probe, (id(ctx.mcells), "s2", 10), source=ctx.mcells)

    # 2. covering (driver-side, memoized)
    t("covering_metro", lambda: cached_covering("s2", poly, 10))

    # 3. full region query, cold then warm x3
    t("region_metro_cold", lambda: region_query_docs(
        spark, ctx.mcells, poly, "s2", 10).count())
    t("region_metro_warm", lambda: region_query_docs(
        spark, ctx.mcells, poly, "s2", 10).count(), n=3)

    # 4. plan-construction only (no action)
    t("region_metro_construct", lambda: region_query_docs(
        spark, ctx.mcells, poly, "s2", 10), n=3)

    # 5. raw scan+filter cost: count rows matching the dim cells (no dedup)
    full, boundary = cached_covering("s2", poly, 10)
    fulls = expand_full_to_populated("s2", full, pop, 10)
    bnd = boundary[np.isin(boundary, pop)]
    allc = np.unique(np.concatenate([fulls, bnd]))
    lo, hi = int(allc.min()), int(allc.max())
    print(f"  covering: fulls={len(fulls)} bnd={len(bnd)} "
          f"range=[{lo},{hi}] pop={len(pop)}", flush=True)
    t("scan_join_only", lambda: probe.join(
        F.broadcast(cells_df(spark, allc, "jc")),
        F.col("cell_id") == F.col("jc")).count(), n=3)
    t("scan_range_filter_only", lambda: probe.where(
        (F.col("cell_id") >= lo) & (F.col("cell_id") <= hi)).count(), n=3)
    t("scan_count_only", lambda: probe.count(), n=3)

    # 6. range-prefiltered variant of the full query
    def range_variant():
        pr2 = probe.where((F.col("cell_id") >= lo) & (F.col("cell_id") <= hi))
        dim = _batch_dim(spark, pr2, [("q", poly)], "s2", 10, pop)
        j, _ = dim
        return j.select("doc_id").dropDuplicates(["doc_id"]).count()
    t("region_metro_rangepre", range_variant, n=3)

    # ---- kNN decomposition -------------------------------------------
    from oscar_spatial_index_compare_spark.operators import knn as K

    hctx = eng.context("h3", 6)
    hctx.mcells.count()
    KNN_QUERIES = [(1, 48.86, 2.36, 5), (2, -33.0, 151.0, 10),
                   (3, 89.0, 10.0, 3), (4, 0.0, 0.0, 7), (5, 13.37, 179.0, 5)]
    probe_h = hctx.mcells.where(
        (F.col("grid") == "h3") & (F.col("res") == 6)).select(
        "doc_id", "lat", "lon", "cell_id")
    t("knn_counts_action", lambda: K._cell_doc_counts(
        probe_h, hctx.mcells, (id(hctx.mcells), "h3", 6)))
    t("knn_construct", lambda: K.knn_docs(
        spark, hctx.mcells, KNN_QUERIES, "h3", 6))
    t("knn_cold_exec", lambda: K.knn_docs(
        spark, hctx.mcells, KNN_QUERIES, "h3", 6).count())
    t("knn_warm_exec", lambda: K.knn_docs(
        spark, hctx.mcells, KNN_QUERIES, "h3", 6).count(), n=3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
