"""Content-addressed posting store (ItemIndexFactory dedup parity,
``apps/main.cpp:154``; equal sets share one id,
``src/OscarSearchSgIndex.cpp:190``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oscar_spatial_index_compare_spark.operators.posting_store import (
    posting_store_build,
    posting_store_collisions,
    posting_store_stats,
    resolve_postings,
)

ROWS = [
    # (token, qt, grid, res, cell_id, is_fm, doc_ids, n_docs)
    ("a", "exact", "zxy", 9, 1, False, [1, 2, 3], 3),
    ("a", "exact", "zxy", 9, 2, False, [7], 1),
    ("b", "exact", "zxy", 9, 1, False, [1, 2, 3], 3),   # dup of row 0's list
    ("b", "exact", "zxy", 9, 3, False, [7], 1),         # dup of row 1's list
    ("c", "exact", "zxy", 9, 2, True, None, 4),         # fm: no list stored
    ("c", "exact", "zxy", 9, 4, False, [2, 7, 9], 3),
]
SCHEMA = ("token string, qt string, grid string, res int, cell_id long,"
          " is_fm boolean, doc_ids array<long>, n_docs long")


def _tp(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_store_holds_one_row_per_distinct_list(spark):
    store, refs = posting_store_build(_tp(spark))
    assert store.count() == 3  # [1,2,3], [7], [2,7,9]
    assert store.select("list_id").distinct().count() == 3
    # equal lists share the SAME id (the addIndex contract): 5 pm refs but
    # only 3 distinct ids
    pm_refs = refs.where(F.col("list_id").isNotNull())
    assert pm_refs.count() == 5
    assert pm_refs.select("list_id").distinct().count() == 3


def test_fm_rows_keep_null_refs(spark):
    _store, refs = posting_store_build(_tp(spark))
    assert refs.where(F.col("is_fm") & F.col("list_id").isNotNull()).count() == 0
    assert refs.where(~F.col("is_fm") & F.col("list_id").isNull()).count() == 0


def test_resolve_is_exact_inverse(spark):
    tp = _tp(spark)
    store, refs = posting_store_build(tp)
    back = resolve_postings(refs, store)
    assert sorted(back.columns) == sorted(tp.columns)
    key = lambda r: (r["token"], r["cell_id"])
    got = sorted([r.asDict() for r in back.collect()], key=key)
    want = sorted([r.asDict() for r in tp.collect()], key=key)
    assert got == want


def test_collision_audit_flags_duplicate_ids(spark):
    # a forged 64-bit collision: two distinct lists sharing one list_id
    forged = spark.createDataFrame(
        [(11, [1, 2]), (11, [3]), (22, [4])], "list_id long, doc_ids array<long>")
    assert posting_store_collisions(forged) == 1


def test_no_collisions_and_exact_stats(spark):
    tp = _tp(spark)
    store, _refs = posting_store_build(tp)
    assert posting_store_collisions(store) == 0
    row = posting_store_stats(tp).collect()[0]
    assert row.n_refs == 5
    assert row.slots_total == 3 + 1 + 3 + 1 + 3
    assert row.n_unique_lists == 3
    assert row.slots_stored == 3 + 1 + 3
