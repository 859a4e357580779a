"""Duplicate clustering: connected components over near-dup pairs +
canonical-survivor selection (the step that turns pair detection into an
actually deduplicated corpus)."""

from oscar_spatial_index_compare_spark.operators.dedup import (
    dedup_canonical,
    dup_clusters,
)


def test_chain_and_island_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_canonical_survivors(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(1, 13)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)],
                                  "doc_a long, doc_b long")
    got = {r.doc_id for r in dedup_canonical(docs, pairs).collect()}
    assert got == {1, 5, 6, 7, 8, 9, 10, 12}


def test_long_chain_converges(spark):
    # diameter 30 chain: exercises multi-round propagation + convergence stop
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  "doc_a long, doc_b long")
    got = {r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == {0}


def test_jaccard_guard_refuses_large_corpus(spark):
    # the exact shingle self-join is the small-scale oracle variant only;
    # above max_docs it must refuse and point at minhash_lsh_pairs
    import pytest

    from oscar_spatial_index_compare_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        jaccard_pairs(docs, 500_000, max_docs=1)
    assert jaccard_pairs(docs, 100_000, max_docs=None).count() == 1
