"""Deterministic synthetic Common-Crawl-style corpus (input_hint shape).

Generates ``(url, warc_ts, html, text, lang)`` + ``doc_id`` rows entirely
inside Spark (``spark.range`` → column expressions), seed-free: every value
is a pure function of ``doc_id``, so the corpus is byte-identical across
runs, partitionings and cluster sizes (no ``Date.now``/RNG — FIXTURES §1,
SURVEY §7 hard-part 5).  Token stream is drawn from the gazetteer vocabulary
with the hot-word skew (~the 5 metro words appear in most docs) so hot-cell
handling is exercised at any scale.

This is the scale knob for benchmarks: ``synth_documents(spark, n)`` costs
O(n) with no input data, so scaling runs can use corpora far larger than the
test fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gazetteer import HOT_WORDS, VOCAB

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
_N_WORDS = 40


def synth_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """n_docs deterministic documents in the input_hint shape."""
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    base = base.withColumnRenamed("id", "doc_id")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    hot_arr = F.array(*[F.lit(w) for w in HOT_WORDS])
    # word i of doc d = vocab[(d*31 + i*17 + (d>>3)) % |V|]; every 7th word is
    # hot with probability tied to doc id → hot-cell skew
    words = F.expr(
        f"transform(sequence(0, {_N_WORDS - 1}), i -> "
        f"  CASE WHEN i % 7 = CAST(doc_id % 7 AS INT)"
        f"       THEN element_at(array({', '.join(repr(w) for w in HOT_WORDS)}), "
        f"            CAST((doc_id + i) % {len(HOT_WORDS)} AS INT) + 1)"
        f"       ELSE element_at(array({', '.join(repr(w) for w in VOCAB)}), "
        f"            CAST((doc_id * 31 + i * 17 + CAST(doc_id / 8 AS BIGINT)) % {len(VOCAB)} AS INT) + 1)"
        f"  END)"
    )
    text = F.concat_ws(" ", words)
    return base.select(
        "doc_id",
        F.concat(
            F.lit("https://crawl.example.com/page/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id * 17)"
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in _LANGS]),
            (F.col("doc_id") % len(_LANGS)).cast("int") + 1,
        ).alias("lang"),
    )
