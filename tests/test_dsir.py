"""DSIR importance weights: split determinism, weight semantics, edge
cases, and the broadcast-model plan shape."""

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.classify import (
    DSIR_SCALE,
    dsir_importance,
    dsir_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_every_doc_present_and_split_deterministic(spark):
    docs = _docs(spark, ["a b c", "d e", "", "f", "a b c"])
    out1 = {r["doc_id"]: r for r in dsir_importance(docs).collect()}
    out2 = {r["doc_id"]: r for r in dsir_importance(docs).collect()}
    assert len(out1) == 5
    for d in out1:
        assert out1[d] == out2[d]  # md5 split + weights fully replayable


def test_target_docs_and_featureless_docs_unweighted(spark):
    docs = _docs(spark, ["x y z", "", "x y"])
    for r in dsir_importance(docs, target_rate=1.0).collect():
        # everything target: no raw doc gets a weight, nothing kept
        assert r["is_target"] and r["weight_scaled"] is None and not r["keep"]
    for r in dsir_importance(docs, target_rate=0.0).collect():
        assert not r["is_target"]
        if r["n_feats"] == 0:
            assert r["weight_scaled"] is None and not r["keep"]
        else:
            assert r["weight_scaled"] is not None


def test_target_like_raw_doc_scores_above_scale(spark):
    # 10 near-identical "target-flavored" docs + distinct noise docs:
    # any raw doc sharing the repeated flavor has its buckets enriched
    # in whichever split the md5 carve lands the copies, so weights
    # separate the flavored raw docs from noise raw docs
    flavored = ["the quick brown fox jumps over the lazy dog"] * 12
    noise = [f"zxq{i} wvu{i} tsr{i} qpo{i}" for i in range(12)]
    docs = _docs(spark, flavored + noise)
    rows = dsir_importance(docs, target_rate=0.4).collect()
    flav = [
        r["weight_scaled"]
        for r in rows
        if r["doc_id"] < 12 and not r["is_target"]
    ]
    noi = [
        r["weight_scaled"]
        for r in rows
        if r["doc_id"] >= 12 and not r["is_target"]
    ]
    assert flav and noi
    # flavored raw docs are strictly more target-like than every noise doc
    assert min(flav) > max(noi)
    assert all(w > DSIR_SCALE for w in flav)


def test_plan_model_broadcast_no_windows(spark):
    from tests.test_plan_quality import plan_of

    docs = _docs(spark, ["a b", "c d"])
    plan = plan_of(dsir_importance(docs))
    assert "Window" not in plan
    # the ratio model is bucket-bounded and must reach the score join
    # as a broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_explicit_target_docs_mode(spark):
    # external target corpus: every docs row is raw and weighted;
    # target-flavored raw docs outscore noise
    target = _docs(spark, ["the quick brown fox jumps high"] * 6)
    docs = spark.createDataFrame(
        [(100, "the quick brown fox runs"), (101, "zzq wwk vvt uup")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_importance(docs, target_docs=target).collect()
    }
    assert all(not r["is_target"] for r in rows.values())
    assert rows[100]["weight_scaled"] is not None
    assert rows[101]["weight_scaled"] is not None
    assert rows[100]["weight_scaled"] > rows[101]["weight_scaled"]
    assert rows[100]["weight_scaled"] > DSIR_SCALE


def _weights_df(spark, rows):
    """Synthetic dsir_importance-shaped relation: (doc_id,
    weight_scaled)."""
    return spark.createDataFrame(
        rows, "doc_id long, weight_scaled long"
    ).select(
        "doc_id",
        F.lit(False).alias("is_target"),
        F.lit(1).cast("long").alias("n_feats"),
        "weight_scaled",
        F.lit(True).alias("keep"),
    )


def test_dsir_select_budget_exact_and_deterministic(spark):
    docs = _docs(
        spark, [f"alpha beta w{i} gamma delta t{i % 5}" for i in range(40)]
    )
    out1 = dsir_select(docs, budget_docs=10).collect()
    out2 = dsir_select(docs.repartition(5), budget_docs=10).collect()
    cands = [r for r in out1 if r["weight_scaled"] is not None]
    sel1 = sorted(r["doc_id"] for r in out1 if r["selected"])
    sel2 = sorted(r["doc_id"] for r in out2 if r["selected"])
    assert len(sel1) == min(10, len(cands))
    assert sel1 == sel2  # partitioning-invariant draw
    # ranks are the contiguous permutation 0..n_cand-1
    assert sorted(r["sel_rank"] for r in out1) == list(range(len(out1)))


def test_dsir_select_budget_edge_cases(spark):
    docs = _docs(spark, ["a b c", "d e f", "g h i"])
    assert dsir_select(docs, budget_docs=0).filter("selected").count() == 0
    big = dsir_select(docs, budget_docs=10_000)
    assert big.filter("selected").count() == big.count()  # all candidates
    try:
        dsir_select(docs, budget_docs=-1)
        raise AssertionError("negative budget must raise")
    except ValueError:
        pass


def test_dsir_select_weight_monotone_under_fixed_uniforms(spark):
    # same ids (=> same uniforms); raising one doc's weight can only
    # lower its priority key, so its rank must not worsen
    base = _weights_df(spark, [(i, 1_000_000) for i in range(20)])
    boosted = _weights_df(
        spark,
        [(i, 1_000_000 if i != 7 else 500_000_000) for i in range(20)],
    )
    docs = _docs(spark, ["x"] * 20)  # ignored when weights= is passed
    r_base = {
        r["doc_id"]: r["sel_rank"]
        for r in dsir_select(docs, 5, weights=base).collect()
    }
    r_boost = {
        r["doc_id"]: r["sel_rank"]
        for r in dsir_select(docs, 5, weights=boosted).collect()
    }
    assert r_boost[7] <= r_base[7]


def test_dsir_select_excludes_nonpositive_and_null_weights(spark):
    w = _weights_df(
        spark, [(1, 10_000), (2, 0), (3, None), (4, 20_000)]
    )
    docs = _docs(spark, ["x"] * 5)
    out = dsir_select(docs, 10, weights=w).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 4]
