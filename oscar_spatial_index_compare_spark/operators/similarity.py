"""Similarity search over the embeddings table (driver mandate).

Two paths:
  * **brute-force cosine top-k** — the exactness baseline: JVM-side
    ``F.zip_with``/``F.aggregate`` dot products against broadcast query
    vectors, per-partition bounded top-k, global rank.  Oracle: DuckDB
    ``list_dot_product`` (same sequential fold order; scores quantized to
    integer micro-units so ulp noise cannot flip equality).
  * **LSH-bucketed ANN** — the 100-TB path: deterministic random-hyperplane
    sign bits (seed-free constants derived from index arithmetic) bucket the
    vectors; queries scan only matching buckets (optionally ±hamming-1
    neighbors).  Recall is corpus-dependent → driver entry is rows-only;
    tests/test_similarity.py asserts recall ≥ 0.6 vs brute force on sf0.001,
    exact per-row scores, and near-dup recall ≥ 0.8 on injected duplicates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 12
DIM = 64


def _planes(dim: int = DIM, n: int = N_PLANES) -> np.ndarray:
    """Deterministic hyperplanes: golden-ratio low-discrepancy lattice,
    no RNG, reproducible in SQL as literals if ever needed."""
    i = np.arange(n * dim, dtype=np.float64).reshape(n, dim)
    v = np.cos(2.0 * np.pi * ((i * 0.6180339887498949) % 1.0)) + 0.1 * np.sin(i % 7)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _dot_col(vec_col, q: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_col(vec_col):
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    emb: DataFrame, queries: list[tuple[int, list[float]]], k: int
) -> DataFrame:
    """→ (query_id, vec_id, sim_micro, rank): exact cosine top-k per query."""
    parts = []
    for qid, q in queries:
        qn = float(np.linalg.norm(np.asarray(q, dtype=np.float64)))
        sim = _dot_col(F.col("embedding"), q) / (_norm_col(F.col("embedding")) * F.lit(qn))
        parts.append(emb.select(
            F.lit(qid).cast("long").alias("query_id"),
            "vec_id",
            F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("sim_micro"),
        ))
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim_micro", "rank")
    )


def cosine_topk_oracle(queries: list[tuple[int, list[float]]], k: int) -> str:
    sels = []
    for qid, q in queries:
        qlit = "[" + ", ".join(repr(float(x)) for x in q) + "]"
        qn = repr(float(np.linalg.norm(np.asarray(q, dtype=np.float64))))
        sim = (
            f"list_dot_product(CAST(embedding AS DOUBLE[]), {qlit})"
            f" / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * {qn})"
        )
        sels.append(f"""
SELECT * FROM (
  SELECT CAST({qid} AS BIGINT) AS query_id, vec_id,
         CAST(FLOOR(({sim}) * 1000000.0 + 0.5) AS BIGINT) AS sim_micro,
         CAST(ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(({sim}) * 1000000.0 + 0.5) AS BIGINT) DESC, vec_id ASC
         ) AS INT) AS rank
  FROM embeddings
) WHERE rank <= {k}""")
    return "\nUNION ALL\n".join(sels)


# --------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# --------------------------------------------------------------------------

def lsh_bucket_col(vec_col, planes: np.ndarray):
    bucket = None
    for j, plane in enumerate(planes):
        bit = F.when(_dot_col(vec_col, plane.tolist()) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def ann_topk(
    emb: DataFrame, queries: list[tuple[int, list[float]]], k: int,
    spark: SparkSession, hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket ± ``hamming`` bit
    flips (multiprobe — 79 of 4096 buckets at hamming 2, ~2% of the corpus),
    exact cosine within candidates.  At 100 TB the bucketed table is written
    partitioned by bucket → queries touch a few partitions.

    Contract (verified in tests/test_similarity.py): recall ≥ 0.6 on true
    NEAR neighbors (sim ≳ 0.95).  On uniform-random vectors whose "top-k"
    sit at cos ≈ 0.3 no sublinear index can rank them — that regime is the
    brute-force ``cosine_topk``'s job."""
    planes = _planes()
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes))
    rows = []
    n_p = len(planes)
    for qid, q in queries:
        v = np.asarray(q, dtype=np.float64)
        bits = [(1 << j) if float(v @ planes[j]) >= 0 else 0 for j in range(n_p)]
        b0 = sum(bits)
        probes = {b0}
        if hamming >= 1:
            for j in range(n_p):
                probes.add(b0 ^ (1 << j))
        if hamming >= 2:
            for j in range(n_p):
                for j2 in range(j + 1, n_p):
                    probes.add(b0 ^ (1 << j) ^ (1 << j2))
        for b in probes:
            rows.append((qid, int(b)))
    probe_df = F.broadcast(spark.createDataFrame(rows, "query_id long, bucket long"))
    cand = bucketed.join(probe_df, "bucket")
    parts = []
    for qid, q in queries:
        qn = float(np.linalg.norm(np.asarray(q, dtype=np.float64)))
        sim = _dot_col(F.col("embedding"), q) / (_norm_col(F.col("embedding")) * F.lit(qn))
        parts.append(
            cand.where(F.col("query_id") == qid).select(
                "query_id", "vec_id",
                F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("sim_micro"),
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    scored = scored.dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim_micro", "rank")
    )


def write_bucketed_embeddings(emb: DataFrame, path: str) -> None:
    """Persist the ANN index: embeddings written PARTITIONED BY LSH bucket.
    At 100 TB this is the layout that makes ann_topk_bucketed a
    partition-pruned read — a query touches ~79/4096 directories (hamming-2
    multiprobe), never the full corpus."""
    planes = _planes()
    emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes)) \
        .write.mode("overwrite").partitionBy("bucket").parquet(path)


def ann_topk_bucketed(
    spark: SparkSession, path: str, queries: list[tuple[int, list[float]]],
    k: int, hamming: int = 2,
) -> DataFrame:
    """ann_topk over a write_bucketed_embeddings layout: the bucket filter
    is a PARTITION filter (visible as PartitionFilters in the scan), so
    non-probed buckets are never read.  Same results as ann_topk."""
    emb = spark.read.parquet(path)
    planes = _planes()
    n_p = len(planes)
    rows = []
    for qid, q in queries:
        v = np.asarray(q, dtype=np.float64)
        b0 = sum((1 << j) if float(v @ planes[j]) >= 0 else 0 for j in range(n_p))
        probes = {b0}
        if hamming >= 1:
            probes |= {b0 ^ (1 << j) for j in range(n_p)}
        if hamming >= 2:
            probes |= {
                b0 ^ (1 << j) ^ (1 << j2)
                for j in range(n_p) for j2 in range(j + 1, n_p)
            }
        rows.extend((qid, int(b)) for b in probes)
    probe_df = F.broadcast(spark.createDataFrame(rows, "query_id long, bucket long"))
    all_buckets = sorted({b for _, b in rows})
    cand = emb.where(F.col("bucket").isin(all_buckets)).join(probe_df, "bucket")
    parts = []
    for qid, q in queries:
        qn = float(np.linalg.norm(np.asarray(q, dtype=np.float64)))
        sim = _dot_col(F.col("embedding"), q) / (_norm_col(F.col("embedding")) * F.lit(qn))
        parts.append(
            cand.where(F.col("query_id") == qid).select(
                "query_id", "vec_id",
                F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("sim_micro"),
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    scored = scored.dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim_micro", "rank")
    )


# banded OR-construction for near-dup detection: a pair is a candidate when
# ANY band of 4 sign bits matches.  For cosine θ the per-bit agreement is
# p = 1 − θ/π; candidate probability 1−(1−p⁴)³ ≈ 0.96 at sim 0.95 (the
# single 12-bit bucket of r01 had only ~0.28 there — the recall hole the
# r01 VERDICT flagged).
N_NEARDUP_BANDS, PLANES_PER_BAND = 3, 4


def embedding_neardup_pairs(emb: DataFrame, spark: SparkSession,
                            sim_threshold_micro: int = 990_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH self-join +
    exact cosine verify over candidates only — → (vec_a, vec_b, sim_micro)."""
    planes = _planes()
    cands = []
    for band in range(N_NEARDUP_BANDS):
        sub = planes[band * PLANES_PER_BAND:(band + 1) * PLANES_PER_BAND]
        b = emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), sub)).select(
            "bucket", "vec_id"
        )
        a = b.alias("a")
        c = b.alias("c")
        cands.append(
            a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
                   & (F.col("a.vec_id") < F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"))
        )
    cand = cands[0]
    for x in cands[1:]:
        cand = cand.unionByName(x)
    cand = cand.dropDuplicates(["vec_a", "vec_b"])
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pair = cand.join(ea, "vec_a").join(eb, "vec_b")
    dot = F.aggregate(
        F.zip_with(F.col("emb_a"), F.col("emb_b"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    sim = dot / (_norm_col(F.col("emb_a")) * _norm_col(F.col("emb_b")))
    out = pair.select(
        "vec_a", "vec_b",
        F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("sim_micro"),
    )
    return out.where(F.col("sim_micro") >= sim_threshold_micro)
