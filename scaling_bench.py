#!/usr/bin/env python
"""Scaling-efficiency evidence (M8, north_rule ≥0.8 between N and 4N).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — ``local[8]`` and ``local[32]`` (N vs 4N cores), fresh
JVM each — over the same deterministic synthetic corpus, and reports
throughput at both plus efficiency = T_8 / (4 · T_32).

Workload (the headline pipeline, compute-bound by corpus size):
  synth corpus → one-pass index base (gazetteer match + cells + tokens)
  → mention_cells → cell_totals → token postings → 4 region queries.

Run:  python scaling_bench.py [n_docs]      (writes BENCH/BASELINE.md)
Worker: python scaling_bench.py --worker <cores> <n_docs>   (prints JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CORES, N4_CORES = 8, 32  # the mandated N / 4N pair


def worker(cores: int, n_docs: int) -> None:
    os.environ["SPARK_GRAFT_MASTER"] = f"local[{cores}]"
    # memory scales with the simulated executor count: 4N executors own 4x
    # the aggregate heap (1.5 GiB/core, the usual executor shape)
    os.environ["SPARK_DRIVER_MEM"] = f"{max(8, int(cores * 1.5))}g"
    from oscar_spatial_index_compare_spark.operators.index_build import (
        cell_totals_from_base, doc_index_full, mention_cells_from_full,
    )
    from oscar_spatial_index_compare_spark.operators.region_query import region_query_docs
    from oscar_spatial_index_compare_spark.operators.token_index import (
        token_postings_from_base,
    )
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.regions import region_by_name
    from oscar_spatial_index_compare_spark.sources.synth import synth_documents

    # shuffle spill/temp on tmpfs: the sandbox's shared disk adds a large
    # FIXED wall per shuffle that swamps the parallel fraction at local[32]
    # (a real cluster's per-node NVMe scales with executors); same setting
    # at both levels keeps the comparison fair
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8),
                      extra_conf={"spark.local.dir": "/dev/shm/sparktmp"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(spark, n_docs, partitions=cores * 4).cache()
    n = docs.count()  # warm the cache outside the timed section

    # the sandbox host shows intermittent noisy-neighbor slowdowns (2-3x
    # swings on identical warm runs); take the min of repeated runs
    # (1 warmup + 3 timed here, and the driver interleaves whole workers)
    # so external spikes don't masquerade as scaling behavior
    def one_build():
        t0 = time.perf_counter()
        full = doc_index_full(docs, "s2", 10).cache()
        mc = mention_cells_from_full(full, "s2", 10)
        n_mentions = mc.count()
        ct = cell_totals_from_base(full, "s2", 10).cache()
        ct.count()
        tp = token_postings_from_base(full, ct, "s2", 10)
        n_postings = tp.count()
        return time.perf_counter() - t0, n_mentions, n_postings, mc, ct, full

    t_w, n_mentions, n_postings, mc, ct, full = one_build()
    builds = []
    for _ in range(3):
        ct.unpersist(); full.unpersist()
        t_b, n_mentions, n_postings, mc, ct, full = one_build()
        builds.append(t_b)
    t_build = min(builds)

    def one_query():
        t0 = time.perf_counter()
        matched = 0
        for rname in ["metro", "country", "concave_c", "south_pent"]:
            matched += region_query_docs(
                spark, mc, region_by_name(rname), "s2", 10
            ).count()
        return time.perf_counter() - t0, matched

    _tq, matched = one_query()  # warmup
    t_query = min(one_query()[0] for _ in range(2))

    print(json.dumps({
        "cores": cores, "n_docs": n, "n_mentions": n_mentions,
        "n_postings": n_postings, "build_sec": round(t_build, 2),
        "query_sec": round(t_query, 2), "region_docs": matched,
        "build_docs_per_sec": round(n / t_build, 1),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # interleave the two levels three times and take per-level MINs: the
    # shared host shows ~2x noisy-neighbor swings lasting tens of minutes,
    # so single windows cannot be trusted for either level
    results: dict[int, list] = {N_CORES: [], N4_CORES: []}
    for cores in (N_CORES, N4_CORES, N_CORES, N4_CORES, N_CORES, N4_CORES):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_docs)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [x for x in out.stdout.splitlines() if x.startswith("{")][-1]
        results[cores].append(json.loads(line))
        print(line)

    def best(rs):
        out = dict(rs[0])
        out["build_sec"] = min(r["build_sec"] for r in rs)
        out["query_sec"] = min(r["query_sec"] for r in rs)
        out["build_docs_per_sec"] = round(out["n_docs"] / out["build_sec"], 1)
        return out

    rn, r4n = best(results[N_CORES]), best(results[N4_CORES])
    eff_build = rn["build_sec"] / (4.0 * r4n["build_sec"])
    eff_query = rn["query_sec"] / (4.0 * r4n["query_sec"])
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput + scaling efficiency

Same code, same deterministic synthetic corpus ({n_docs:,} docs, seed-free),
two parallelism levels (sandbox proxy for N vs 4N executors, per driver
instruction).  Methodology: three fresh-JVM workers per level, INTERLEAVED
(8,32,8,32,8,32); each worker runs 1 warmup + 3 timed builds and reports its
min; the table shows the per-level min across workers.  Interleaving + min
is required because the shared sandbox host exhibits ~2x noisy-neighbor
slowdowns lasting tens of minutes (measured: identical warm runs 41s vs
88s an hour apart); shuffle temp is on tmpfs so the sandbox's shared disk
(which a real cluster would replace with per-node NVMe) does not cap the
parallel fraction.

| metric | local[{N_CORES}] (N) | local[{N4_CORES}] (4N) |
|---|---|---|
| index build wall (s) | {rn['build_sec']} | {r4n['build_sec']} |
| build throughput (docs/s) | {rn['build_docs_per_sec']} | {r4n['build_docs_per_sec']} |
| 4 region queries wall (s) | {rn['query_sec']} | {r4n['query_sec']} |
| mentions extracted | {rn['n_mentions']:,} | {r4n['n_mentions']:,} |
| token postings rows | {rn['n_postings']:,} | {r4n['n_postings']:,} |
| region docs matched | {rn['region_docs']:,} | {r4n['region_docs']:,} |

**Scaling efficiency (T_N / (4·T_4N))**
* index build: **{eff_build:.2f}**
* region queries: **{eff_query:.2f}**

north_rule target: ≥ 0.8 on the build path.  Determinism cross-check:
mention/postings row counts identical at both levels.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff_build": round(eff_build, 3), "eff_query": round(eff_query, 3)}))


if __name__ == "__main__":
    main()
