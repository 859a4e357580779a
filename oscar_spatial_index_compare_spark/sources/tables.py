"""Table loading + the Common-Crawl-shape adapter (SURVEY S1/S2).

Reference analog: ``OsmCompleter::setAllFilesFromPrefix`` + ``energize()``
(``apps/main.cpp:111-121``) — open the store and expose typed views.  Here a
"store" is a directory of parquet (tests) or Iceberg tables (production); the
schema-on-read adapter below lifts the driver's ``documents`` table into the
exact input_hint shape ``(url, warc_ts, html, text, lang)`` with *pure,
deterministic, SQL-expressible* column derivations so the DuckDB oracle can
reproduce every byte.

Per-row invariant (north_rule): ``text`` is carried through untouched, so
sha256(text) per url is trivially byte-identical across runs and parallelism
levels; tests/test_infra.py::test_extraction_determinism_across_parallelism
asserts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ensure_scan_parallelism(df: DataFrame, spark: SparkSession,
                            key: str = "doc_id") -> DataFrame:
    """Guard against unsplittable narrow inputs: if the scan plans FEWER
    partitions than the cluster has cores (e.g. one parquet file with one
    row group — every derived narrow stage would run single-task), insert a
    deterministic hash repartition on ``key`` so the whole downstream
    pipeline parallelizes.  No-op whenever the scan already has enough
    splits (any real at-scale input), so the extra exchange only ever buys
    parallelism that the input could not provide.  Hash-on-key is
    deterministic under task retry (never round-robin on rand —
    SPARK-38388)."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, F.col(key))


def documents_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's documents table lifted to the input_hint shape.

    Columns (input_hint): url:string, warc_ts:timestamp, html:binary,
    text:string, lang:string — plus doc_id kept as the join key.  All derived
    columns are deterministic functions of (doc_id, source, text) only.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id * 17)"
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


DOCUMENTS_CC_ORACLE = """
SELECT doc_id,
       'https://' || source || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id * 17) AS warc_ts,
       encode('<html><body>' || text || '</body></html>') AS html,
       text,
       lang
FROM documents
"""
