"""Token/search index build — B4/B5 (SURVEY §2.3).

Reference: ``OscarSearchSgIndex::create`` workers intersect each token's
matched items with per-trixel postings (two-pointer merge,
``src/OscarSearchSgIndex.cpp:144-161``) and classify each trixel full-match
vs partial-match by comparing matched-count to the trixel total
(``src/OscarSearchSgIndex.cpp:178-197``).

Spark shape: one chained DataFrame —

    token_docs (explode text) ⋈ doc_cells → groupBy(token, cell)
      → n_matched, matched doc array
      ⋈ cell_totals → is_fm = (n_matched == n_total); doc_ids NULL iff fm

The fm bit is the reference's "store 1 bit instead of the item list"
compression (SURVEY §4): fm rows carry NULL doc_ids and flatten() recovers
the full list from cell_totals — at 100 TB this is the dominant
postings-size saver for common tokens.

Query types: the reference pre-materializes exact/prefix/suffix/substring
payloads per trie node (``include/hic/OscarSearchSgIndex.h:29-35``).  We
materialize ``exact`` postings; prefix/suffix/substring leaves expand to the
matching token set against the (small, broadcastable) token dictionary at
plan time and union exact postings — on Spark the lazy union plan beats
4x index duplication (decision recorded in SURVEY §7).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OBJ_HASH_AGG_CONF = "spark.sql.execution.useObjectHashAggregateExec"


@contextmanager
def sorted_list_agg(spark):
    """Scope a terminal action so collect_list groupBys plan as
    SortAggregate instead of ObjectHashAggregate.

    For posting-list builds (tens of millions of appended values across
    ~10^5 groups) the object-hash buffer churn made the list pass 3-4x
    slower than a shuffle-sort + streaming append (measured in the r04
    scaling profile: 103s → 31s at 48M triples / 8 cores).  The conf only
    affects TypedImperativeAggregate functions (collect_list/collect_set),
    so the count/sum HashAggregates in the same plan are untouched; it is
    restored on exit so interactive-session aggregations keep the default.
    Plans are frozen at ACTION time — wrap the ``.write``/``.count``, not
    the DataFrame construction.
    """
    old = spark.conf.get(_OBJ_HASH_AGG_CONF, "true")
    spark.conf.set(_OBJ_HASH_AGG_CONF, "false")
    try:
        yield
    finally:
        spark.conf.set(_OBJ_HASH_AGG_CONF, old)


def token_docs(docs: DataFrame) -> DataFrame:
    """(token, doc_id) distinct pairs from the document token stream."""
    return docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )


def token_postings(tdocs: DataFrame, dcells: DataFrame, ctotals: DataFrame) -> DataFrame:
    """→ (token, qt, grid, res, cell_id, is_fm, doc_ids, n_docs).

    ``dcells``: doc_cells at one or more (grid, res); ``ctotals``:
    cell_totals for the same keys.
    """
    # tdocs (token,doc) and dcells (doc,cell) are both distinct, so the join
    # rows are distinct per (token,grid,res,cell,doc) → collect_list/count
    # are exact (and scale — see token_postings_from_base)
    j = tdocs.join(dcells, "doc_id")
    matched = j.groupBy("token", "grid", "res", "cell_id").agg(
        F.array_sort(F.collect_list("doc_id")).alias("m_docs"),
        F.count("*").alias("n_matched"),
    )
    out = matched.join(
        ctotals.select("grid", "res", "cell_id", F.col("n_docs").alias("n_total")),
        ["grid", "res", "cell_id"],
    )
    return out.select(
        "token",
        F.lit("exact").alias("qt"),
        "grid", "res", "cell_id",
        (F.col("n_matched") == F.col("n_total")).alias("is_fm"),
        F.when(F.col("n_matched") == F.col("n_total"), F.lit(None)).otherwise(
            F.col("m_docs")
        ).alias("doc_ids"),
        F.col("n_matched").cast("long").alias("n_docs"),
    )


def _pm_lists(pm_pairs: DataFrame, pm_keys_n: DataFrame, key: list[str],
              hot_threshold: int | None) -> DataFrame:
    """collect_list of doc_id per ``key`` group with conditional two-phase
    salting for hot groups (> hot_threshold docs).  ``pm_keys_n`` must carry
    ``key`` + ``n_matched`` (the count pass's exact group sizes — salting
    reuses it, so hot detection costs no extra pass)."""
    from .index_build import HOT_SALT_BUCKETS

    if hot_threshold is None:
        return pm_pairs.groupBy(*key).agg(
            F.array_sort(F.collect_list("doc_id")).alias("m_docs"))
    hot = pm_keys_n.where(F.col("n_matched") > hot_threshold).select(*key)
    cold = pm_pairs.join(F.broadcast(hot), key, "left_anti").groupBy(
        *key
    ).agg(F.array_sort(F.collect_list("doc_id")).alias("m_docs"))
    hot_salted = pm_pairs.join(F.broadcast(hot), key, "left_semi").withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(HOT_SALT_BUCKETS)))
    hot_partial = hot_salted.groupBy(*key, "_salt").agg(
        F.collect_list("doc_id").alias("_part"))
    hot_sets = hot_partial.groupBy(*key).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias("m_docs"))
    return cold.unionByName(hot_sets)


def token_postings_from_base(base: DataFrame, ctotals: DataFrame,
                             grid: str, res: int,
                             n_docs_hint: int | None = None,
                             broadcast_fm: bool = True,
                             hash_col=None) -> DataFrame:
    """One-pass variant over doc_index_base (doc_id, toks, cells): the
    (token, doc, cell) fan-out is a pure double explode — no join with a
    doc_cells table at all (that join was the dominant shuffle of the r01
    build; VERDICT perf finding).  One wide groupBy + one aggregated join.

    ``count(*)`` == distinct docs per (token, cell) because toks and cells
    are array_distinct per doc, so each (token, doc, cell) row is unique.

    Two-pass shape (r04, the scaling-gate straggler fix):

      pass 1  count-only groupBy (fully map-combined — shuffle carries one
              long per group-partial, not per triple) ⋈ cell_totals
              → classifies every (token, cell) group fm/pm AND hot/cold
      pass 2  collect_list over the **pm triples only**, with explicit
              two-phase salting for the hot pm groups

    fm groups (a token matching every doc of a cell — common tokens in
    dense cells, the largest lists) ship NO doc ids at all: their lists are
    recovered from cell_totals at query time (doc_ids NULL — the
    reference's fm-bit compression, ``src/OscarSearchSgIndex.cpp:178-197``,
    applied at BUILD time so it also elides their shuffle volume; measured
    24% of all doc-slots on the 1M-doc scaling corpus).  The count pass
    doubles as the hot-group detection, so salting costs no extra pass; a
    single reducer building one 100k+-id list was the named stage-tail
    straggler of the r03 scaling gate.  ``n_docs_hint`` ≤ threshold proves
    no group can be hot (a group never exceeds the corpus doc count) and
    skips the salt split, not the count pass (fm classification needs it).

    Physical shape of the list pass (profiled on the 1M-doc scaling corpus,
    ~10^9 triples — the r04 scaling-gate work):

      * the list-pass shuffle carries SLIM FIXED-WIDTH rows ``(th, cell_id,
        doc_id)`` — three longs, no token string.  ``th = xxhash64(token)``;
        the vanishingly-rare case of two tokens sharing a th is detected
        from the count pass (``colls``) and those tokens are routed through
        a string-keyed path instead, so the result is exact at any scale
        while the hot shuffle stays 24 bytes/row and radix-sortable (string
        keys forced comparison-based sorting and ~40% more shuffle bytes —
        the text build is memory-bandwidth-bound on the bench host, so row
        width is wall time).  Tokens are recovered after aggregation by an
        output-sized join against the count pass's (th, cell_id → token)
        groups.
      * the fm anti-join build side is an explicit ``F.broadcast``: left
        alone, AQE planned a sort-merge anti join that SORTED all triples
        (~6x the broadcast-probe wall); broadcast makes the probe a pure
        map pass.  fm-key cardinality is bounded by vocab × populated
        cells and shrinks relatively as cells densify (fm needs a token in
        EVERY doc of the cell), so the build side stays broadcastable as
        the corpus grows; ``broadcast_fm=False`` restores the AQE-chosen
        join for a corpus whose dictionary genuinely outgrows the driver.
        The count pass, colls, fm and hot broadcasts all hang off the SAME
        count-aggregation exchange, which Spark's ReuseExchange executes
        once per action.
      * the caller should run the terminal action under
        ``sorted_list_agg``: collect_list via ObjectHashAggregate was 3-4x
        slower than SortAggregate on this volume (object-buffer churn);
        the scoped conf flips only typed-imperative aggregates, so
        count/sum HashAggregates elsewhere are untouched.

    ``hash_col`` overrides the token-hash expression (tests narrow it to
    force th collisions and exercise the string-keyed path).
    """
    from .index_build import HOT_CELL_THRESHOLD

    hot_threshold: int | None = HOT_CELL_THRESHOLD
    if n_docs_hint is not None and n_docs_hint <= hot_threshold:
        hot_threshold = None
    key3 = ["th", "token", "cell_id"]
    key2 = ["th", "cell_id"]
    pairs = base.select(
        "doc_id", F.explode("toks").alias("token"), "cells"
    ).select("token", "doc_id", F.explode("cells").alias("cell_id")
             ).withColumn(
        "th", hash_col if hash_col is not None else F.xxhash64("token"))
    # count(*) == distinct docs per group (triples distinct, see docstring)
    counts = pairs.groupBy(*key3).agg(F.count("*").alias("n_matched"))
    cls = counts.join(
        ctotals.select("cell_id", F.col("n_docs").alias("n_total")), "cell_id"
    )
    fm_keys = cls.where(F.col("n_matched") == F.col("n_total")).select(
        *key3, "n_matched")
    pm_keys = cls.where(F.col("n_matched") < F.col("n_total")).select(
        *key3, "n_matched")
    # th values shared by >1 distinct token (usually NONE): their triples
    # take the exact string-keyed path below
    colls = (cls.select("th", "token").distinct()
             .groupBy("th").agg(F.count("*").alias("_nt"))
             .where(F.col("_nt") > 1).select("th"))
    # ---- safe path: th <-> token bijective, slim long-only keys
    pairs_safe = pairs.join(F.broadcast(colls), "th", "left_anti").drop("token")
    fm_safe = fm_keys.join(F.broadcast(colls), "th", "left_anti").select(*key2)
    if broadcast_fm:
        fm_safe = F.broadcast(fm_safe)
    pm_pairs_safe = pairs_safe.join(fm_safe, key2, "left_anti")
    pm_keys_safe = pm_keys.join(F.broadcast(colls), "th", "left_anti")
    lists_safe = _pm_lists(pm_pairs_safe, pm_keys_safe.select(*key2, "n_matched"),
                           key2, hot_threshold)
    # token recovery: exactly one pm group row per safe (th, cell_id).
    # The token side MUST be the broadcast build side — a shuffle join here
    # would move the aggregated doc arrays (the largest frame of the whole
    # build) a second time; the key->token map is group-count-sized
    tok_map = pm_keys_safe.select(*key2, "token")
    if broadcast_fm:
        tok_map = F.broadcast(tok_map)
    pm_safe = lists_safe.join(tok_map, key2)
    # ---- collided path: token string in the key, exact (normally empty)
    pairs_coll = pairs.join(F.broadcast(colls), "th", "left_semi")
    fm_coll = fm_keys.join(F.broadcast(colls), "th", "left_semi").select(*key3)
    if broadcast_fm:
        fm_coll = F.broadcast(fm_coll)
    pm_pairs_coll = pairs_coll.join(fm_coll, key3, "left_anti")
    pm_keys_coll = pm_keys.join(F.broadcast(colls), "th", "left_semi")
    lists_coll = _pm_lists(pm_pairs_coll, pm_keys_coll.select(*key3, "n_matched"),
                           key3, hot_threshold)
    pm_sets = pm_safe.select("token", "cell_id", "m_docs").unionByName(
        lists_coll.select("token", "cell_id", "m_docs"))
    head = [F.lit("exact").alias("qt"), F.lit(grid).alias("grid"),
            F.lit(res).alias("res")]
    fm_out = fm_keys.select(
        "token", *head, "cell_id",
        F.lit(True).alias("is_fm"),
        F.lit(None).cast("array<long>").alias("doc_ids"),
        F.col("n_matched").cast("long").alias("n_docs"),
    )
    pm_out = pm_sets.select(
        "token", *head, "cell_id",
        F.lit(False).alias("is_fm"),
        F.col("m_docs").alias("doc_ids"),
        F.size("m_docs").cast("long").alias("n_docs"),
    )
    return fm_out.unionByName(pm_out)


def match_tokens(all_tokens: list[str], pattern: str, qt: str) -> list[str]:
    """Expand a leaf pattern to matching dictionary tokens for the given
    query type — the trie lookup analog (plan-time, driver-side)."""
    if qt == "exact":
        return [t for t in all_tokens if t == pattern]
    if qt == "prefix":
        return [t for t in all_tokens if t.startswith(pattern)]
    if qt == "suffix":
        return [t for t in all_tokens if t.endswith(pattern)]
    if qt == "substring":
        return [t for t in all_tokens if pattern in t]
    raise ValueError(qt)


# trie-depth cap of materialize_qt_postings: keys longer than this are NOT
# in the payload table, so a leaf whose pattern exceeds it must take the
# dictionary / distributed-filter path instead (ADVICE r02)
DEFAULT_MAX_KEY_LEN = 12


def materialize_qt_postings(tp_exact: DataFrame, qt: str,
                            max_key_len: int = DEFAULT_MAX_KEY_LEN) -> DataFrame:
    """Materialize a non-exact query-type payload table from exact postings
    — the reference's per-trie-node payloads
    (``include/hic/OscarSearchSgIndex.h:29-35``), Spark-style.

    Each exact posting row fans out to every dictionary KEY that reaches it
    under ``qt`` (prefixes / suffixes / substrings of the token, capped at
    ``max_key_len`` chars like a trie depth cap), then one groupBy merges
    per (key, cell).  Fully distributed — no driver dictionary at any size;
    a query leaf then needs ONE key-equality lookup instead of plan-time
    dictionary expansion.  Output schema == token_postings with qt set.

    ``is_fm`` is inherited (any contributing token fm ⟹ key fm): a pm union
    that happens to cover a whole cell stays pm-with-full-list — items()-
    equivalent, and identical to the planner's plan-time-expansion
    semantics (SURVEY §4 decision), though the reference would reclassify
    such a cell as fm when building the payload from scratch.
    """
    if qt == "prefix":
        keys = F.expr(
            f"transform(sequence(1, least(length(token), {max_key_len})),"
            " i -> substring(token, 1, i))"
        )
    elif qt == "suffix":
        keys = F.expr(
            f"transform(sequence(1, least(length(token), {max_key_len})),"
            " i -> substring(token, -i, i))"
        )
    elif qt == "substring":
        keys = F.expr(
            "array_distinct(flatten(transform(sequence(1, length(token)),"
            f" i -> transform(sequence(i, least(length(token), i + {max_key_len} - 1)),"
            " j -> substring(token, i, j - i + 1)))))"
        )
    else:
        raise ValueError(f"materialize_qt_postings: qt must be non-exact, got {qt!r}")
    fanned = tp_exact.select(
        F.explode(keys).alias("token"),
        "grid", "res", "cell_id",
        F.col("is_fm").alias("_fm"), F.col("doc_ids").alias("_docs"),
        F.col("n_docs").alias("_n"),
    )
    merged = fanned.groupBy("token", "grid", "res", "cell_id").agg(
        F.max("_fm").alias("any_fm"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.coalesce("_docs", F.array()))))
        ).alias("m_docs"),
        # any fm contributor's _n IS the cell total (it matched every doc)
        F.max(F.when(F.col("_fm"), F.col("_n"))).alias("_fm_n"),
    )
    # a key's cell is fm iff ANY contributing token was fm there (that token
    # already matched every doc of the cell) — doc_ids NULL iff fm
    return merged.select(
        "token",
        F.lit(qt).alias("qt"),
        "grid", "res", "cell_id",
        F.col("any_fm").alias("is_fm"),
        F.when(F.col("any_fm"), F.lit(None)).otherwise(F.col("m_docs")).alias("doc_ids"),
        F.when(F.col("any_fm"), F.col("_fm_n"))
        .otherwise(F.size("m_docs")).cast("long").alias("n_docs"),
    )


QT_FALLBACK = {
    # reference fallback chain substring→prefix→suffix→exact
    # (src/OscarSearchWithSg.cpp:71-86, src/static-htm-index.cpp:83-105)
    "substring": ["substring", "prefix", "suffix", "exact"],
    "prefix": ["prefix", "exact"],
    "suffix": ["suffix", "exact"],
    "exact": ["exact"],
}


def resolve_qt(requested: str, available: set[str]) -> str:
    for qt in QT_FALLBACK[requested]:
        if qt in available:
            return qt
    raise KeyError(f"no query type available for {requested!r}")
