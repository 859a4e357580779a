#!/usr/bin/env python
"""Emit .explain('formatted') evidence for the r06 third-pass changes:

  * region_north_band_pip_{before,after}.txt — unrolled-literal PIP gate vs
    the polygon-independent HOF gate (forced via PIP_HOF_MAX_ROWS)
  * knn_counts_{before,after}.txt — the kNN per-cell stats action:
    dropDuplicates + two-branch union vs two count_distinct aggregations
  * tiles_mentions_{before,after}.txt — tiles over re-extracted mentions vs
    over the stored index_base arrays
  * index_base_h3_{before,after}.txt — h3 base from a fresh gazetteer match
    vs re-derived from the stored s2 base
"""
from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")


def dump(df, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, name), "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{name}: Exchanges={txt.count('Exchange')} "
          f"Scans={txt.count('Scan parquet')} "
          f"PythonEval={txt.count('EvalPython') + txt.count('MapInArrow') + txt.count('ArrowEval')}",
          flush=True)


def main() -> None:
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    from pyspark.sql import functions as F

    from oscar_spatial_index_compare_spark.engine import Engine
    from oscar_spatial_index_compare_spark.operators import region_query as rq
    from oscar_spatial_index_compare_spark.operators.index_build import (
        doc_index_full, doc_index_full_from_full,
    )
    from oscar_spatial_index_compare_spark.operators.mentions import (
        extract_mentions,
    )
    from oscar_spatial_index_compare_spark.operators.tiles import tiles
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.regions import region_by_name

    spark = get_spark(app_name="osi-plans-r06c", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.local.dir": "/dev/shm/sparktmp"})
    cat_root = tempfile.mkdtemp(prefix="plans_catalog_", dir="/dev/shm/sparktmp")
    eng = Engine(spark, SF_DIR, catalog_root=cat_root)
    ctx = eng.context("s2", 10)

    poly = region_by_name("north_band")
    cap = rq.PIP_HOF_MAX_ROWS
    rq.PIP_HOF_MAX_ROWS = 0
    dump(rq.region_query_docs(spark, ctx.mcells, poly, "s2", 10),
         "region_north_band_pip_before.txt")
    rq.PIP_HOF_MAX_ROWS = cap
    dump(rq.region_query_docs(spark, ctx.mcells, poly, "s2", 10),
         "region_north_band_pip_after.txt")

    # kNN counts action: before = dropDuplicates pairs re-run per union
    # branch; after = the shipped count_distinct form
    probe = ctx.mcells.where(
        (F.col("grid") == "s2") & (F.col("res") == 10)).select(
        "doc_id", "lat", "lon", "cell_id")
    pairs = probe.select("cell_id", "doc_id").dropDuplicates()
    before = (
        pairs.groupBy("cell_id").agg(F.count("*").alias("a"))
        .select(F.lit(0).alias("kind"), "cell_id", "a", F.lit(0).alias("b"))
        .unionByName(
            pairs.groupBy("doc_id").agg(F.count("*").alias("nc"))
            .agg(F.max("nc").alias("a"), F.count("*").alias("b"))
            .select(F.lit(1).alias("kind"), F.lit(0).alias("cell_id"), "a", "b"))
    )
    dump(before, "knn_counts_before.txt")
    after = (
        probe.groupBy("cell_id").agg(F.count_distinct("doc_id").alias("a"))
        .select(F.lit(0).alias("kind"), "cell_id", "a", F.lit(0).alias("b"))
        .unionByName(
            probe.groupBy("doc_id").agg(F.count_distinct("cell_id").alias("nc"))
            .agg(F.max("nc").alias("a"), F.count("*").alias("b"))
            .select(F.lit(1).alias("kind"),
                    F.lit(0).cast("long").alias("cell_id"), "a", "b"))
    )
    dump(after, "knn_counts_after.txt")

    # tiles: before = re-extraction, after = stored-base arrays (what
    # Engine.mentions now points at once a base exists)
    dump(tiles(extract_mentions(spark, eng.docs), [3, 8, 12]),
         "tiles_mentions_before.txt")
    dump(tiles(eng.mentions, [3, 8, 12]), "tiles_mentions_after.txt")

    # h3 base: before = fresh gazetteer match, after = re-derived from the
    # stored s2 base
    dump(doc_index_full(eng.docs, "h3", 6), "index_base_h3_before.txt")
    dump(doc_index_full_from_full(eng._full_src, "h3", 6),
         "index_base_h3_after.txt")
    spark.stop()


if __name__ == "__main__":
    main()
