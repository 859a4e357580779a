"""Geo-entity extraction from web text (SURVEY X4) — pure JVM dataflow.

Reference analog: items acquire geometry from the OSM store
(``src/OscarSgIndex.cpp:104-122``); our documents acquire geometry by
matching gazetteer place names in ``text``.

Spark-first design: tokenize with built-in ``split``/``transform`` (no UDF),
explode unigrams+bigrams, then a **broadcast hash join** against the ~200-row
gazetteer.  At 10^12 docs this is shuffle-free: the only wide op downstream
is the groupBy that builds postings.  Extraction is a pure function of
``text`` → byte-identical mention sets across runs and parallelism levels
(north_rule per-row invariant; asserted in tests/test_determinism.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.gazetteer import (
    gazetteer_array_col,
    gazetteer_df,
    jitter_lat_col,
    jitter_lon_col,
    mentions_subquery_sql,
)


def matched_gazetteer_col() -> F.Column:
    """array<struct<name,glat,glon>> of gazetteer entries mentioned in
    ``text`` — a row-wise ``contains`` scan of the dictionary literal.

    Equivalent to the explode+broadcast-join form in ``extract_mentions``:
    with single-space-separated tokens, name ∈ unigrams∪bigrams(text) ⟺
    ``' '||name||' '`` is a substring of ``' '||text||' '`` (the same
    equivalence every DuckDB oracle relies on via mentions_subquery_sql).
    Entirely JVM-side; no shuffle, no UDF — this is what makes the one-pass
    index build (doc_index_base) a single narrow stage.
    """
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    return F.filter(
        gazetteer_array_col(),
        lambda g: F.contains(padded, F.concat(F.lit(" "), g["name"], F.lit(" "))),
    )


def extract_mentions(spark: SparkSession, docs: DataFrame,
                     with_idx: bool = False) -> DataFrame:
    """documents(doc_id, text, ...) → mentions(doc_id[, mention_idx], name,
    lat, lon).

    A mention is a distinct gazetteer name occurring in the doc's token
    stream (unigrams and space-joined bigrams).  ``with_idx`` adds
    mention_idx (the doc's mentions numbered in name order — deterministic,
    SQL-reproducible) at the cost of a per-doc window shuffle; the index
    pipelines never need it, so the hot path skips it.
    """
    toks = F.split(F.col("text"), " ")
    # adjacent-pair bigrams: zip tokens with their shifted-by-one selves;
    # the dangling last pair concat()s with NULL → NULL → filtered out
    bigrams = F.expr(
        "filter(zip_with(split(text, ' '),"
        " slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"
    )
    cand = F.array_distinct(F.concat(toks, bigrams))
    exploded = docs.select("doc_id", F.explode(cand).alias("name"))
    gaz = F.broadcast(gazetteer_df(spark))
    m = exploded.join(gaz, "name").select(
        "doc_id", "name",
        jitter_lat_col(F.col("doc_id"), F.col("name"), F.col("lat")).alias("lat"),
        jitter_lon_col(F.col("doc_id"), F.col("name"), F.col("lon")).alias("lon"),
    )
    if not with_idx:
        return m
    w = Window.partitionBy("doc_id").orderBy("name")
    return m.select(
        "doc_id",
        F.row_number().over(w).alias("mention_idx"),
        "name", "lat", "lon",
    )


MENTIONS_ORACLE_SQL = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY name) AS INT) AS mention_idx,
       name, lat, lon
FROM {mentions_subquery_sql()} m
"""
