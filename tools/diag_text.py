#!/usr/bin/env python
"""Diagnostic: token-postings build stage breakdown at 8 vs 32 cores.

Not part of the engine — a profiling aid for the scaling gate. Runs the
same text pass as scaling_bench.worker but with the driver UI enabled and
dumps per-stage wall/task metrics from the REST API so the non-scaling
stage can be identified instead of guessed.

Usage:  python diag_text.py [n_docs]          (starts standalone cluster)
        python diag_text.py --worker <cores> <n_docs>
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from scaling_bench import EXEC_CORES, EXEC_MEM, _stop_daemons, start_cluster  # noqa: E402


def worker(cores: int, n_docs: int) -> None:
    master = os.environ.get("SCALING_MASTER", "")
    extra_conf = {
        "spark.local.dir": "/dev/shm/sparktmp",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
    }
    if master:
        os.environ["SPARK_GRAFT_MASTER"] = master
        extra_conf.update({
            "spark.cores.max": str(cores),
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": EXEC_MEM,
            "spark.pyspark.python": sys.executable,
            "spark.executorEnv.PYTHONPATH": REPO,
        })
    else:
        os.environ["SPARK_GRAFT_MASTER"] = f"local[{cores}]"
    os.environ["SPARK_DRIVER_MEM"] = "8g"
    from oscar_spatial_index_compare_spark.operators.index_build import (
        cell_totals_from_base, doc_index_full,
    )
    from oscar_spatial_index_compare_spark.operators.token_index import (
        sorted_list_agg, token_postings_from_base,
    )
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.synth import synth_documents

    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = get_spark(app_name=f"diag-{cores}", cores=cores,
                      shuffle_partitions=cores * 4, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(spark, n_docs, partitions=cores * 4)
    base_path = "/dev/shm/sparktmp/diag_base"
    ct_path = "/dev/shm/sparktmp/diag_ct"
    full = doc_index_full(docs, "s2", 10)
    full.write.mode("overwrite").parquet(base_path)
    with sorted_list_agg(spark):
        cell_totals_from_base(
            spark.read.parquet(base_path), "s2", 10, n_docs_hint=n_docs
        ).write.mode("overwrite").parquet(ct_path)
    base = spark.read.parquet(base_path)
    ct = spark.read.parquet(ct_path)
    n_cells = ct.count()
    tp_path = f"/dev/shm/sparktmp/diag_tp_{cores}"

    def one(impl):
        t0 = time.perf_counter()
        with sorted_list_agg(spark):
            token_postings_from_base(base, ct, "s2", 10, n_docs_hint=n_docs,
                                     impl=impl).\
                sortWithinPartitions("token", "cell_id").write.mode(
                    "overwrite").parquet(tp_path)
        return time.perf_counter() - t0

    impls = os.environ.get("DIAG_IMPLS", "arrow,jvm").split(",")
    t_mark = time.time()
    ab = {}
    for impl in impls:
        ab[impl] = {"warm": round(one(impl), 2),
                    "t1": round(one(impl), 2), "t2": round(one(impl), 2)}
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.loads(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete").read())
    rows = []
    for s in stages:
        rows.append({
            "id": s["stageId"], "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "sub": s.get("firstTaskLaunchedTime") or s.get("submissionTime"),
            "exec_run_ms": s.get("executorRunTime"),
            "exec_cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
            "shuffle_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "shuffle_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
            "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
            "output_mb": round((s.get("outputBytes") or 0) / 1e6, 1),
            "completion": s.get("completionTime"),
        })
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "n_cells": n_cells,
        "ab": ab, "t_mark": t_mark, "stages": rows,
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    import subprocess
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    m, w, url = start_cluster()
    try:
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(cores), str(n_docs)],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
                env={**os.environ, "SCALING_MASTER": url})
            lines = [x for x in out.stdout.splitlines() if x.startswith("{")]
            if not lines:
                print(out.stdout[-3000:])
                print(out.stderr[-5000:])
                raise RuntimeError(f"worker {cores} failed")
            with open(f"/tmp/diag_text_{cores}.json", "w") as f:
                f.write(lines[-1])
            d = json.loads(lines[-1])
            print(json.dumps({k: d[k] for k in ("cores", "n_cells", "ab")}),
                  flush=True)
    finally:
        _stop_daemons(w, m)


if __name__ == "__main__":
    main()
