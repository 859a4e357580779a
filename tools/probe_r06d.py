#!/usr/bin/env python
"""kNN cold-cost hypothesis probes: codegen vs counts-action variants."""
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
    from pyspark.sql import functions as F

    from oscar_spatial_index_compare_spark.engine import Engine
    from oscar_spatial_index_compare_spark.operators import knn as K
    from oscar_spatial_index_compare_spark.session import get_spark

    spark = get_spark(app_name="osi-probe-r06d", cores=CPUS,
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
    hctx = eng.context("h3", 6)
    hctx.mcells.count()
    KNN_QUERIES = [(1, 48.86, 2.36, 5), (2, -33.0, 151.0, 10),
                   (3, 89.0, 10.0, 3), (4, 0.0, 0.0, 7), (5, 13.37, 179.0, 5)]
    probe_h = hctx.mcells.where(
        (F.col("grid") == "h3") & (F.col("res") == 6)).select(
        "doc_id", "lat", "lon", "cell_id")

    # variant counts: two count_distinct aggregations, no dedup pre-stage
    def counts_v2():
        per_cell = probe_h.groupBy("cell_id").agg(
            F.count_distinct("doc_id").alias("a"))
        spread = (probe_h.groupBy("doc_id")
                  .agg(F.count_distinct("cell_id").alias("nc"))
                  .agg(F.max("nc").alias("a"), F.count("*").alias("b")))
        r1 = per_cell.collect()
        r2 = spread.collect()
        return r1, r2

    # v3: same but single collect via union
    def counts_v3():
        per_cell = probe_h.groupBy("cell_id").agg(
            F.count_distinct("doc_id").alias("a")).select(
            F.lit(0).alias("kind"), "cell_id", "a", F.lit(0).alias("b"))
        spread = (probe_h.groupBy("doc_id")
                  .agg(F.count_distinct("cell_id").alias("nc"))
                  .agg(F.max("nc").alias("a"), F.count("*").alias("b"))
                  .select(F.lit(1).alias("kind"), F.lit(0).cast("long").alias("cell_id"),
                          "a", "b"))
        return per_cell.unionByName(spread).collect()

    t("counts_current_cold", lambda: K._cell_doc_counts(
        probe_h, hctx.mcells, (id(hctx.mcells), "h3", 6)))
    t("counts_v2_two_collects", counts_v2, n=2)
    t("counts_v3_union", counts_v3, n=2)

    # sanity: v3 equals current
    cur = K._COUNTS_CACHE[(id(hctx.mcells), "h3", 6)]
    rows = counts_v3()
    cells = {int(r.cell_id): int(r.a) for r in rows if r.kind == 0}
    srow = next(r for r in rows if r.kind == 1)
    assert cells == cur[1], "per-cell mismatch"
    assert (int(srow.a), int(srow.b)) == (cur[2], cur[3]), "spread mismatch"
    print("  counts_v3 == current: OK", flush=True)

    # knn exec cold (codegen on) — first construction in this session
    t("knn_cold_codegen_on", lambda: K.knn_docs(
        spark, hctx.mcells, KNN_QUERIES, "h3", 6).count())
    t("knn_warm_codegen_on", lambda: K.knn_docs(
        spark, hctx.mcells, KNN_QUERIES, "h3", 6).count(), n=3)

    # now with wholeStage off + interpreted exprs: re-pay cold?  Need a new
    # plan shape — change k by 0 (same queries) won't invalidate janino
    # cache; instead shift query ids to force a different literal set.
    Q2 = [(qid + 10, lat, lon, k) for qid, lat, lon, k in KNN_QUERIES]
    Q3 = [(qid + 20, lat, lon, k) for qid, lat, lon, k in KNN_QUERIES]
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("knn_cold_wholestage_off", lambda: K.knn_docs(
        spark, hctx.mcells, Q2, "h3", 6).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    t("knn_cold_newids_codegen_on", lambda: K.knn_docs(
        spark, hctx.mcells, Q3, "h3", 6).count())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
