"""Round-6 hardening: SimHash width validation, the iterative-only
connected-components short-circuit, and sparse-id-safe semdedup
big-cell tiling (the three ADVICE items plus the 32-bit SimHash
default)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    dedup,
    similarity,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "entirely different words here")],
        "doc_id long, text string",
    )


def test_simhash_default_width_is_32(spark):
    fp = dedup.simhash_fingerprints(_docs(spark)).collect()
    # identical docs agree; a 32-bit fingerprint must be able to
    # exceed the 16-bit ceiling on at least one doc of this corpus
    by_id = {r["doc_id"]: r["simhash"] for r in fp}
    assert by_id[1] == by_id[2]
    assert all(0 <= v < (1 << 32) for v in by_id.values())


@pytest.mark.parametrize("bits", [0, 64, 128])
def test_simhash_rejects_out_of_range_bits(spark, bits):
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash_fingerprints(_docs(spark), bits=bits)
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash_near_pairs(_docs(spark), bits=bits, bands=4)


def test_connected_components_iterative_only_short_circuit(spark):
    # fused_max_edges=0 must skip the cost probe and still produce
    # the identical min-label components via the iterative path
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)],
        "doc_a long, doc_b long",
    )
    want = {
        tuple(r)
        for r in dedup.connected_components(pairs).collect()
    }
    got = {
        tuple(r)
        for r in dedup.connected_components(pairs, fused_max_edges=0).collect()
    }
    assert got == want
    assert {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)} == got


def test_semdedup_tiling_identical_on_sparse_ids(spark):
    # ids 0/1 seed the k-means; the rest are SPARSE (stride 997) so
    # floor(id / block_size) blocking would occupy ~one id per block
    # and grow the broadcast block-pair relation quadratically —
    # hash-derived blocks must keep the tiled output identical to the
    # single-task path regardless of id density
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.001, 0.0, 0.0])] + [
        (2 + i * 997, [1.0, 0.001 * (i % 5), 0.0, 0.0]) for i in range(38)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(k=2, iters=1, threshold=0.999)
    base = {tuple(r) for r in similarity.semdedup(df, **kw).collect()}
    tiled = {
        tuple(r)
        for r in similarity.semdedup(
            df, **kw, max_cell_rows=8, block_size=4
        ).collect()
    }
    assert base == tiled
    # sanity: the degenerate cell really exceeded the bound
    from collections import Counter

    cells = similarity.kmeans_cells(df, k=2, iters=1).collect()
    assert max(Counter(r["cell"] for r in cells).values()) > 8


def test_semdedup_tiling_chain_clusters_cross_block_edges(spark):
    # Chain-shaped near-dup clusters (adjacent nodes above threshold,
    # skip-one below): every edge is a BRIDGE, so any pair the tiled
    # path drops splits a component and diverges from the single-task
    # path. Hash-derived blocks scatter ids arbitrarily, so in
    # off-diagonal tiles the lower id of an edge regularly hashes to
    # the HIGHER block — an ``ia < ib`` mask there silently loses
    # those edges (the round-6 ADVICE finding); a clique corpus
    # cannot see this because its connectivity survives edge loss.
    import math

    theta = math.radians(1.8)  # cos θ≈0.99951 ≥ th; cos 2θ≈0.99803 < th
    rows = []
    for chain, (dx, dy) in enumerate([(0, 1), (2, 3)]):
        for i in range(10):
            v = [0.0, 0.0, 0.0, 0.0]
            v[dx] = math.cos(i * theta)
            v[dy] = math.sin(i * theta)
            # ids interleave across chains so block hashes mix freely
            rows.append((chain + 2 * i * 7, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(k=1, iters=1, threshold=0.999)
    base = {tuple(r) for r in similarity.semdedup(df, **kw).collect()}
    tiled = {
        tuple(r)
        for r in similarity.semdedup(
            df, **kw, max_cell_rows=8, block_size=4
        ).collect()
    }
    assert base == tiled
    # sanity: exactly two components (one per chain), each of size 10
    from collections import Counter

    comp_sizes = Counter(r[2] for r in base)
    assert sorted(comp_sizes.values()) == [10, 10]


def test_weighted_classifier_known_weights(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.functions.text import (
        md5_long,
    )
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        classify,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, "cc")], "doc_id long, text string"
    )
    # weight table covering ONLY token 'aa'; 'bb'/'cc' fall to default
    b_aa = (
        spark.createDataFrame([("aa",)], "t string")
        .select((md5_long(F.col("t")) % classify.N_BUCKETS).alias("b"))
        .first()["b"]
    )
    weights = spark.createDataFrame([(b_aa, 10)], "bucket long, weight long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"], r["keep"])
        for r in classify.weighted_linear_score(
            docs, weights, default_weight=-2
        ).collect()
    }
    assert got[1] == (3, 10 + 10 - 2, True)  # aa, aa hit; bb default
    assert got[2] == (0, 0, True)            # zero-token doc survives
    assert got[3] == (1, -2, False)


def test_weighted_classifier_plan_broadcast_one_aggregate(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        classify,
    )

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    weights = spark.createDataFrame([(0, 1)], "bucket long, weight long")
    plan = (
        classify.weighted_linear_score(docs, weights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one logical aggregate = one partial + one final HashAggregate
    assert plan.count("HashAggregate") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantile_prune_nearest_rank_and_ties(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        classify,
    )

    # scores 1..8 with a tie block at 5: P75 rank = ceil(8*.75)=6 ->
    # threshold = 6th smallest = 5; ties at 5 are all kept
    scores = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 5), (7, 7), (8, 8)],
        "doc_id long, score_sum long",
    )
    got = {
        r["doc_id"]: (r["threshold"], r["keep"])
        for r in classify.quantile_prune(scores, pct=75).collect()
    }
    assert all(t == 5 for t, _ in got.values())
    assert {d for d, (_, k) in got.items() if k} == {5, 6, 7, 8}
    with pytest.raises(ValueError, match="pct"):
        classify.quantile_prune(scores, pct=100)


def test_remove_duplicate_spans_lee_semantics(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        dedup,
    )

    base = "a b c d e f g h i j k l m n o p q r s t"
    docs = spark.createDataFrame(
        [
            (1, base),                      # canonical copy survives
            (2, base),                      # exact clone -> empties
            (3, "x y z " + base + " w v"),  # shared span cut, edges kept
            (4, "unique words only here"),  # short & unique -> untouched
            (5, ""),                        # empty passes through
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_duplicate_spans(docs, span_tokens=5).collect()
    }
    assert got[1] == (base, 20, 0)
    assert got[2] == ("", 20, 20)
    assert got[3] == ("x y z w v", 25, 20)
    assert got[4] == ("unique words only here", 4, 0)
    assert got[5] == ("", 0, 0)
    with pytest.raises(ValueError, match="span_tokens"):
        dedup.remove_duplicate_spans(docs, span_tokens=1)


def test_remove_duplicate_spans_intra_doc_repeat(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        dedup,
    )

    # the SAME doc repeating a span: first occurrence canonical, the
    # repeat (and the windows bridging it) cut
    docs = spark.createDataFrame(
        [(1, "p q r s t u p q r s t u")], "doc_id long, text string"
    )
    got = dedup.remove_duplicate_spans(docs, span_tokens=6).collect()[0]
    assert got["clean_text"] == "p q r s t u"
    assert got["n_removed"] == 6
