"""Connected components (min-label propagation) and keeper selection:
multi-hop chains must converge to one component without a graph
library, and unpaired docs keep themselves."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.dedup import (
    connected_components,
    neardup_keepers,
)


def test_chain_converges_to_min_label(spark):
    # path graph 1-2-3-4 (diameter 3: needs >1 propagation round) and
    # a separate pair 10-11
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.vertex: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_keepers_cover_unpaired_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    got = {r.doc_id: r.keeper_doc_id for r in neardup_keepers(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}
    # the deduplicated corpus = docs that keep themselves
    kept = sorted(k for k, v in got.items() if k == v)
    assert kept == [0, 1, 2, 3]


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.keeper_doc_id for r in neardup_keepers(docs, pairs).collect()}
    assert got == {1: 1, 2: 2}
