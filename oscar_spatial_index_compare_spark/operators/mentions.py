"""Geo-entity extraction from web text (SURVEY X4) — pure JVM dataflow.

Reference analog: items acquire geometry from the OSM store
(``src/OscarSgIndex.cpp:104-122``); our documents acquire geometry by
matching gazetteer place names in ``text``.

Spark-first design: tokenize with built-in ``split``/``transform`` (no UDF),
explode unigrams+bigrams, then a **broadcast hash join** against the ~200-row
gazetteer.  At 10^12 docs this is shuffle-free: the only wide op downstream
is the groupBy that builds postings.  Extraction is a pure function of
``text`` → byte-identical mention sets across runs and parallelism levels
(north_rule per-row invariant; asserted in
tests/test_infra.py::test_extraction_determinism_across_parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.gazetteer import (
    jitter_lat_col,
    jitter_lon_col,
    mentions_subquery_sql,
)


def matched_idx_col() -> F.Column:
    """array<int> of gazetteer indices whose name occurs in ``text`` —
    200 UNROLLED ``contains`` CASE expressions over one padded-text value.

    Why unrolled instead of `filter(gaz_array, lambda …)`: lambda-taking
    collection functions are CodegenFallback in Spark — the whole stage
    drops out of whole-stage codegen into interpreted eval (measured 5-10x
    wall on the 1M-doc build, with executor threads in Concat.eval /
    interpreted UTF8String paths).  Unrolled CASEs + array_compact are all
    codegen expressions; subexpression elimination shares the single padded
    text across the 200 checks.
    """
    from ..sources.gazetteer import gazetteer

    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    cases = [
        F.when(F.contains(padded, F.lit(f" {name} ")), F.lit(i))
        for i, (name, _la, _lo, _pop) in enumerate(gazetteer())
    ]
    return F.array_compact(F.array(*cases))


def matched_gazetteer_col() -> F.Column:
    """array<struct<name,glat,glon>> of gazetteer entries mentioned in
    ``text`` — matched-index scan (codegen) + struct assembly over the ~30
    matches only.

    Equivalent to the explode+broadcast-join form: with single-space
    separated tokens, name ∈ unigrams∪bigrams(text) ⟺ ``' '||name||' '``
    is a substring of ``' '||text||' '`` (the same equivalence every DuckDB
    oracle relies on via mentions_subquery_sql).  Entirely JVM-side; no
    shuffle, no UDF — this is what makes the one-pass index build
    (doc_index_base) a single narrow stage.
    """
    from ..sources.gazetteer import gazetteer

    entries = gazetteer()
    names = F.array(*[F.lit(n) for n, _la, _lo, _p in entries])
    glats = F.array(*[F.lit(la) for _n, la, _lo, _p in entries])
    glons = F.array(*[F.lit(lo) for _n, _la, lo, _p in entries])
    return F.transform(
        matched_idx_col(),
        lambda i: F.struct(
            F.element_at(names, i + 1).alias("name"),
            F.element_at(glats, i + 1).alias("glat"),
            F.element_at(glons, i + 1).alias("glon"),
        ),
    )


def extract_mentions(spark: SparkSession, docs: DataFrame,
                     with_idx: bool = False) -> DataFrame:
    """documents(doc_id, text, ...) → mentions(doc_id[, mention_idx], name,
    lat, lon).

    A mention is a distinct gazetteer name occurring in the doc's token
    stream (unigrams and space-joined bigrams) — matched with the row-wise
    dictionary-literal ``contains`` scan (matched_gazetteer_col), the same
    form every oracle uses.  The r1 variant exploded all ~108 unigram+bigram
    candidates per doc and broadcast-joined the gazetteer; its zip_with/
    concat bigram expression is codegen-ineligible (higher-order functions
    run interpreted) and allocation-heavy — at local[32] the allocation
    storm drove GC into stop-the-world spirals (measured: 34% thread CPU,
    10x wall).  The contains scan allocates almost nothing per row.

    ``with_idx`` adds mention_idx (the doc's mentions numbered in name
    order — deterministic, SQL-reproducible) at the cost of a per-doc
    window shuffle; the index pipelines never need it.
    """
    m = docs.select(
        "doc_id", F.explode(matched_gazetteer_col()).alias("g")
    ).select(
        "doc_id",
        F.col("g.name").alias("name"),
        jitter_lat_col(F.col("doc_id"), F.col("g.name"), F.col("g.glat")).alias("lat"),
        jitter_lon_col(F.col("doc_id"), F.col("g.name"), F.col("g.glon")).alias("lon"),
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
