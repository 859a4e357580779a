#!/usr/bin/env python
"""Region-query PIP lowering probes: unrolled-literal codegen vs
array-literal HOF (interpreted, polygon-independent source)."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scratch/sf1.0rep")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def pip_hof_sql(lat: str, lon: str, poly) -> str:
    """Array-driven PIP: same per-edge arithmetic as pip_sql, edges carried
    as ONE array<struct> literal (goes to codegen references, so generated
    source is polygon-independent)."""
    import numpy as np
    x1s, y1s = poly[:, 1], poly[:, 0]
    x2s, y2s = np.roll(x1s, -1), np.roll(y1s, -1)
    edges = ", ".join(
        f"named_struct('y1', CAST('{y1!r}' AS DOUBLE), 'y2', CAST('{y2!r}' AS DOUBLE), "
        f"'dx', CAST('{x2 - x1!r}' AS DOUBLE), 'dy', CAST('{y2 - y1!r}' AS DOUBLE), "
        f"'x1', CAST('{x1!r}' AS DOUBLE))"
        for x1, y1, x2, y2 in zip(x1s, y1s, x2s, y2s))
    return (
        f"(aggregate(array({edges}), 0, (acc, e) -> acc + "
        f"(CASE WHEN ((e.y1 > ({lat})) <> (e.y2 > ({lat})))"
        f" AND (({lon}) < e.dx * (({lat}) - e.y1) / e.dy + e.x1)"
        f" THEN 1 ELSE 0 END)) % 2 = 1)"
    )


def main() -> None:
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    import numpy as np
    from pyspark.sql import functions as F

    from oscar_spatial_index_compare_spark.engine import Engine
    from oscar_spatial_index_compare_spark.functions.geo import pip_sql
    from oscar_spatial_index_compare_spark.operators.region_query import (
        cached_covering, cells_df, expand_full_to_populated, populated_cells,
    )
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.regions import region_by_name

    spark = get_spark(app_name="osi-probe-r06e", cores=CPUS,
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
    ctx = eng.context("s2", 10)
    ctx.mcells.count()
    probe = ctx.mcells.where((F.col("grid") == "s2") & (F.col("res") == 10))
    pop = populated_cells(probe, (id(ctx.mcells), "s2", 10), source=ctx.mcells)

    import pandas as pd

    def dim_join_count(poly, pip_fn):
        full, boundary = cached_covering("s2", poly, 10)
        fulls = expand_full_to_populated("s2", full, pop, 10)
        bnd = boundary[np.isin(boundary, pop)] if len(boundary) else boundary
        rows = [(int(c), False) for c in fulls] + [(int(c), True) for c in bnd]
        dim = spark.createDataFrame(
            pd.DataFrame(rows, columns=["cell_id", "needs_pip"]))
        j = probe.join(F.broadcast(dim), "cell_id")
        gate = f"(NOT needs_pip) OR ({pip_fn('lat', 'lon', poly)})"
        return (j.where(F.expr(gate)).select("doc_id")
                .dropDuplicates(["doc_id"]).count(), len(bnd))

    # warm the shared join/agg shapes once with a no-boundary region (metro)
    t("warmup_metro", lambda: dim_join_count(
        region_by_name("metro"), pip_sql))

    # distinct polygons, each PIP-stage-cold for its own lowering
    for rname in ("north_band", "concave_c", "equator_band"):
        poly = region_by_name(rname)
        n1 = n2 = [None]

        def run_unrolled(p=poly):
            n1[0] = dim_join_count(p, pip_sql)
        def run_hof(p=poly):
            n2[0] = dim_join_count(p, pip_hof_sql)
        t(f"{rname}_unrolled_cold", run_unrolled)
        t(f"{rname}_hof_cold", run_hof)
        assert n1[0][0] == n2[0][0], (rname, n1[0], n2[0])
        print(f"  {rname}: docs={n1[0][0]} bnd_cells={n1[0][1]} EQUAL", flush=True)
        # warm repeats of each form
        t(f"{rname}_unrolled_warm", run_unrolled, n=2)
        t(f"{rname}_hof_warm", run_hof, n=2)

    # strict equality of the boolean over ALL mention rows for one polygon
    poly = region_by_name("concave_c")
    a = probe.select(F.expr(pip_sql("lat", "lon", poly)).alias("v"))
    b = probe.select(F.expr(pip_hof_sql("lat", "lon", poly)).alias("v"))
    na = a.where("v").count()
    nb = b.where("v").count()
    diff = (probe.select("doc_id", "lat", "lon",
                         F.expr(pip_sql("lat", "lon", poly)).alias("v1"),
                         F.expr(pip_hof_sql("lat", "lon", poly)).alias("v2"))
            .where("v1 <> v2").count())
    print(f"  full-table PIP equality: n_unrolled={na} n_hof={nb} "
          f"rows_differing={diff}", flush=True)
    assert diff == 0

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
