"""Content-addressed posting-list store (SURVEY §1 ItemIndexStore row, §4).

Reference: the ItemIndexFactory deduplicates equal posting lists —
``setDeduplication(true)`` (``apps/main.cpp:154``, ``apps/mainc.cpp:116``)
makes ``addIndex`` return the EXISTING index id for an equal id-set
(``src/OscarSearchSgIndex.cpp:190,196-197``), so the serialized store keeps
one copy of each distinct list and postings reference it by id
(``idxStore.at(ptr)``, ``src/OscarSearchSgIndex.cpp:115,133``).

Spark shape — normalize instead of a shared-memory factory:

    store (list_id: long, doc_ids: array<long>)   one row per DISTINCT list
    refs  token_postings columns with ``doc_ids`` replaced by ``list_id``

``list_id = xxhash64(doc_ids)`` (JVM-side, order-sensitive — lists are
array_sort'ed at build so equal sets hash equal).  Everything is one
dropDuplicates on the dictionary side; no driver state, no all-pairs
comparison.  fm rows keep ``list_id`` NULL — the fm bit already elides
those lists entirely (``token_index.token_postings_from_base``), which is
strictly stronger than content-dedup for the full-match case.

Collision budget: a 64-bit content key over U distinct lists expects
~U²/2⁶⁵ collisions — negligible for any single index shard (U ≤ 10⁸ →
< 10⁻⁴ expected) but NOT for a monolithic 10¹²-doc store; the create step
therefore audits with :func:`posting_store_collisions` (one aggregation
over the dictionary) and must rebuild with a wider key (two seeded hashes)
if it ever returns nonzero.  Whether to ENABLE the store is a measured
trade per deployment (SURVEY §4): parquet dictionary+RLE encoding already
compresses repeated small lists, and :func:`posting_store_stats` reports
the exact slot savings so the decision is data-driven, mirroring the
reference's optional ``-D`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def posting_store_build(tpostings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (store, refs): content-addressed split of a token-postings table.

    ``store``: (list_id, doc_ids) with one row per distinct non-NULL list;
    ``refs``: the input with ``doc_ids`` swapped for ``list_id`` (NULL for
    fm rows).  ``resolve_postings(refs, store)`` is the exact inverse.
    """
    refs = tpostings.withColumn(
        "list_id",
        F.when(F.col("doc_ids").isNotNull(), F.xxhash64("doc_ids")),
    ).drop("doc_ids")
    # dedup on (id, list) — identical to dedup on id alone when the key is
    # collision-free, and it means a collision SURVIVES into the store as
    # two rows sharing a list_id, where posting_store_collisions catches it
    # with one aggregation over the (small) dictionary instead of a second
    # pass over the postings
    store = (
        tpostings.where(F.col("doc_ids").isNotNull())
        .select(F.xxhash64("doc_ids").alias("list_id"), "doc_ids")
        .dropDuplicates(["list_id", "doc_ids"])
    )
    return store, refs


def resolve_postings(refs: DataFrame, store: DataFrame) -> DataFrame:
    """Inverse of :func:`posting_store_build` — reattach lists by id.

    The store is the small side (distinct lists only); AQE broadcasts it
    when it fits and falls back to a shuffle join keyed on list_id when a
    100 TB dictionary outgrows that.
    """
    cols = [c for c in refs.columns if c != "list_id"]
    out = refs.join(store, "list_id", "left")
    # token_postings column order: doc_ids sits before n_docs
    ordered = []
    for c in cols:
        if c == "n_docs":
            ordered.append("doc_ids")
        ordered.append(c)
    if "doc_ids" not in ordered:
        ordered.append("doc_ids")
    return out.select(*ordered)


def posting_store_collisions(store: DataFrame) -> int:
    """Create-step audit: number of list_ids carrying >1 distinct list
    (must be 0; a nonzero count demands a wider content key).  One
    aggregation over the dictionary — the store keeps colliding lists as
    separate rows (build dedups on (id, list)) exactly so this check never
    needs the full postings table."""
    bad = store.groupBy("list_id").count().where(F.col("count") > 1)
    return bad.count()


def posting_store_stats(tpostings: DataFrame) -> DataFrame:
    """→ one row (n_refs, slots_total, n_unique_lists, slots_stored) — the
    measured content-dedup win (reference prints the factory's hit counts
    and store size at create; we report the slot-level equivalent).

    ``slots_total`` counts doc-id slots if every pm list were stored
    inline; ``slots_stored`` counts slots in the deduplicated store; the
    ratio is the savings the ``-D`` flag would buy.
    """
    store, refs = posting_store_build(tpostings)
    r = refs.where(F.col("list_id").isNotNull()).agg(
        F.count("*").cast("long").alias("n_refs"),
        F.sum("n_docs").cast("long").alias("slots_total"),
    )
    s = store.agg(
        F.count("*").cast("long").alias("n_unique_lists"),
        F.sum(F.size("doc_ids")).cast("long").alias("slots_stored"),
    )
    return r.crossJoin(s)
