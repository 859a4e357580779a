"""Text-analysis operators for training-data pipelines (driver mandate):
language-ID heuristic, quality scoring, token counting, fingerprinting.

Everything is built-in JVM column expressions with exact DuckDB twins —
integer-quantized scores so cross-engine equality is never float-sensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic per-language marker lexicons (n-gram heuristic stand-in:
# a real fastText/langid model slots into the same operator shape)
LANG_MARKERS = {
    "de": ["der", "und", "nicht", "das", "ist"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "una", "es", "por"],
    "zh": ["de5", "shi4", "zai4", "le5", "he2"],
}
_STOPWORDS = ["the", "a", "and", "of", "to"]


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_alpha_tokens) — whitespace tokens +
    a BPE-ish regex count of alphabetic runs."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.split(F.col("text"), "[^a-zA-Z]+")).cast("long").alias("n_alpha_tokens"),
    )


TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(len(string_split_regex(text, '[^a-zA-Z]+')) AS BIGINT) AS n_alpha_tokens
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred): argmax of marker-lexicon hits, 'en' default.
    Ties broken by language code order (deterministic)."""
    toks = F.split(F.col("text"), " ")
    scores = docs.select("doc_id", *[
        F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms])))
        .alias(f"sc_{lang}")
        for lang, ms in sorted(LANG_MARKERS.items())
    ])
    best = F.greatest(*[F.col(f"sc_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("en")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((F.col(f"sc_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scores.select("doc_id", pred.alias("lang_pred"))


def lang_id_oracle() -> str:
    score_exprs = {
        lang: "(" + " + ".join(
            f"CASE WHEN list_contains(string_split(text, ' '), '{m}') THEN 1 ELSE 0 END"
            for m in ms
        ) + ")"
        for lang, ms in sorted(LANG_MARKERS.items())
    }
    best = "GREATEST(" + ", ".join(score_exprs[lang] for lang in sorted(LANG_MARKERS)) + ")"
    pred = "'en'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = (
            f"CASE WHEN {score_exprs[lang]} = {best} AND {best} > 0"
            f" THEN '{lang}' ELSE {pred} END"
        )
    return f"SELECT doc_id, {pred} AS lang_pred FROM documents"


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, quality_milli): 0-1000 composite of length band, lexical
    diversity and stopword presence (exact integer arithmetic)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    sw = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in _STOPWORDS]))).cast("long")
    len_band = F.when((n >= 20) & (n <= 200), F.lit(400)).otherwise(F.lit(100))
    diversity = (F.lit(300) * nd) / n
    stop = F.when(sw > 0, F.lit(300)).otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        (len_band + F.floor(diversity) + stop).cast("long").alias("quality_milli"),
    )


QUALITY_ORACLE = """
SELECT doc_id,
  CAST(
    (CASE WHEN len(string_split(text,' ')) BETWEEN 20 AND 200 THEN 400 ELSE 100 END)
    + FLOOR((300 * len(list_distinct(string_split(text,' ')))) / len(string_split(text,' ')))
    + (CASE WHEN len(list_filter(string_split(text,' '),
         t -> t IN ('the','a','and','of','to'))) > 0 THEN 300 ELSE 0 END)
  AS BIGINT) AS quality_milli
FROM documents
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): order-insensitive document fingerprint = md5 of the
    sorted distinct token bag (rolling-hash analog, exactly reproducible)."""
    toks = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    return docs.select("doc_id", F.md5(F.concat_ws(" ", toks)).alias("fp"))


FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
FROM documents
"""
