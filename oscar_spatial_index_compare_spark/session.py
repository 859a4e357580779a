"""SparkSession factory for the engine.

Reference analog: the CLI bootstrap in ``apps/main.cpp:111-121`` /
``apps/mainq.cpp:601-611`` (open mmap'd stores, pick thread counts).  In Spark
all of that collapses into session configuration: AQE replaces the hand-rolled
work-stealing thread pool (``src/OscarSgIndex.cpp:81-95``), Arrow replaces the
row-at-a-time marshalling, and shuffle-partition sizing replaces the explicit
``-t`` thread flags.

Design-for-scale notes (100 TB / 1000 executors):
  * AQE on: runtime coalescing of the shuffle that builds cell postings, and
    skew-join splitting for hot cells (major cities) — the reference handles
    the same hot-cell skew with an atomic work counter; we let AQE split
    oversized partitions and additionally salt known-hot cells explicitly
    (see operators/index_build.py).
  * ``spark.sql.shuffle.partitions`` defaults to the local core count here;
    on a real cluster set it ≈ 2-3x total cores via spark-submit --conf.
  * Arrow execution is mandatory (north_rule: vectorized Arrow UDFs, never
    per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "osi-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores=None`` → ``local[*]`` locally; on a cluster the master comes from
    spark-submit and this factory only contributes conf.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        # InferFiltersFromGenerate copies the generator's INPUT expression
        # into a `size(x) > 0` filter that predicate pushdown then drives
        # below every project/exchange down to the file scan — for our
        # computed-array explodes (mention extraction) the whole gazetteer
        # match was evaluated TWICE, the pushed copy at raw-scan
        # parallelism (measured: exploded mentions 6.4s → 1.1s at sf1.0
        # once excluded; the duplicated work scales with corpus size, so
        # this is a 100 TB fix, not a local tweak).  Guide §4.4 describes
        # the same optimizer-duplication trap for filters over computed
        # columns.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # COUNT(*)/MIN/MAX over parquet answer from row-group metadata —
        # catalog snapshot counts become footer reads, not data scans
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    b = b.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
