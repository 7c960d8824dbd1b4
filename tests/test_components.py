"""Connected components (min-label propagation) and keeper selection:
multi-hop chains must converge to one component without a graph
library, and unpaired docs keep themselves."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.dedup import (
    connected_components as cc,
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


def test_fused_and_iterative_paths_identical(spark):
    # randomized graph: both CC paths must produce the same labeling
    import random

    rng = random.Random(7)
    pairs = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(120)
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    fused = {tuple(r) for r in cc(df).collect()}
    loop = {tuple(r) for r in cc(df, fused_max_edges=-1).collect()}
    assert fused == loop and fused


def test_fused_path_handles_string_vertices(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {tuple(r) for r in cc(df).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_null_ids_are_dropped_on_both_paths(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 9), (7, None)], "doc_a long, doc_b long"
    )
    fused = {tuple(r) for r in cc(df).collect()}
    loop = {tuple(r) for r in cc(df, fused_max_edges=-1).collect()}
    # null-containing pairs are not edges; 9 and 7 simply do not
    # appear (keeper selection falls back to self via coalesce)
    assert fused == loop == {(1, 1), (2, 1)}
