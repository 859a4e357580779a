#!/usr/bin/env python
"""Optree cost split: plan construction vs boundary planning vs execution;
plus session/untimed-overhead decomposition."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scratch/sf1.0rep")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

OPTREES = [
    "join / window", "dup + spark", "join - dup", "dup ^ spark",
    "(join + dup) / window - spark", "jo*", "$region:1 / dup",
    "($region:2 - $region:1) / join",
]


def main() -> None:
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    t00 = time.perf_counter()
    from oscar_spatial_index_compare_spark.session import get_spark
    spark = get_spark(app_name="osi-probe-r06f", cores=CPUS,
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.local.dir": "/dev/shm/sparktmp"})
    print(f"  session_start: {time.perf_counter() - t00:.3f}", flush=True)

    t0 = time.perf_counter()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    print(f"  docs_count: {time.perf_counter() - t0:.3f}", flush=True)

    from oscar_spatial_index_compare_spark.engine import Engine
    t0 = time.perf_counter()
    cat_root = tempfile.mkdtemp(prefix="probe_catalog_", dir="/dev/shm/sparktmp")
    eng = Engine(spark, SF_DIR, catalog_root=cat_root)
    print(f"  engine_init: {time.perf_counter() - t0:.3f}", flush=True)

    t0 = time.perf_counter()
    eng.context("s2", 10)
    print(f"  build_s2: {time.perf_counter() - t0:.3f}", flush=True)

    t0 = time.perf_counter()
    p = eng.planner("s2", 10)
    print(f"  planner: {time.perf_counter() - t0:.3f}", flush=True)

    out = {}
    for i, q in enumerate(OPTREES):
        t0 = time.perf_counter()
        c = p.cqr(q)
        t_cqr = time.perf_counter() - t0
        t0 = time.perf_counter()
        from oscar_spatial_index_compare_spark.operators.cqr import cqr_flatten
        from pyspark.sql import functions as F
        if c is None:
            continue
        d = cqr_flatten(c.localCheckpoint(eager=False), p.ctx.ctotals)
        t_docs = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = d.count()
        t_exec = time.perf_counter() - t0
        out[f"optree_{i}"] = (round(t_cqr, 3), round(t_docs, 3), round(t_exec, 3))
        print(f"  optree_{i}: cqr_construct={t_cqr:.3f} "
              f"flatten+boundary={t_docs:.3f} exec={t_exec:.3f} n={n}", flush=True)

    # second pass: same queries again (fresh plans, warm codegen)
    for i, q in enumerate(OPTREES):
        t0 = time.perf_counter()
        n = p.docs(q).count()
        print(f"  optree_{i}_repeat_fullplan: {time.perf_counter() - t0:.3f}",
              flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
