"""DSIR importance weights: split determinism, weight semantics, edge
cases, and the broadcast-model plan shape."""

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.classify import (
    DSIR_SCALE,
    dsir_importance,
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
