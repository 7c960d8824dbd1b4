"""Funnel rejection audit (streaming.corpus.curation_rejects +
the persisted curation_rejects table): every cut doc gets exactly one
(doc_id, stage, reason) row attributed to the first failing gate, the
audit partitions each batch against curate_batch's survivors, the
per-stage counts reconcile with corpus_curation_funnel's deltas, and
streaming replays never grow the table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    partitioning,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
    make_sink,
    read_table,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
    corpus as sc,
)


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


CONFIGS = [
    {},
    {"max_dup_token_frac": 0.5, "max_top_bigram_frac": 0.2},
    {"gopher_kwargs": {}},
    {"min_classifier_score": 0},
    {"redact_pii": True, "unicode_normalize": True},
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_audit_partitions_the_batch(spark, sf_dir, cfg):
    docs = table(spark, sf_dir, "documents")
    eval_docs = partitioning.hash_sample(docs, "doc_id", 0.05, salt="eval")
    kept = sc.curate_batch(docs, eval_docs, min_overlap=10, **cfg)
    rejects = sc.curation_rejects(docs, eval_docs, min_overlap=10, **cfg)
    k, r = _ids(kept), _ids(rejects)
    assert k | r == _ids(docs)
    assert not (k & r)
    # exactly one audit row per rejected doc (first failing stage)
    assert rejects.count() == len(r)
    # reasons resolve for every stage
    assert rejects.filter(F.col("reason").isNull()).count() == 0


def test_audit_reconciles_with_funnel_deltas(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.pipeline_queries import (
        corpus_curation_funnel,
    )

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    # decontamination/eval off: empty eval set
    empty_eval = docs.filter(F.lit(False))
    rejects = sc.curation_rejects(docs, empty_eval, min_overlap=10)
    by_stage = {
        r.stage: r.n
        for r in rejects.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    funnel = {
        r.stage: r.n_docs for r in corpus_curation_funnel(spark, sf).collect()
    }
    assert by_stage.get("lang", 0) == funnel["0_total"] - funnel["1_lang_match"]
    assert (
        by_stage.get("quality", 0)
        == funnel["1_lang_match"] - funnel["2_quality"]
    )
    assert set(by_stage) <= {"lang", "quality"}


def test_stream_audit_persists_and_replays_noop(spark, tmp_path):
    docs = table(spark, "/root/testdata/sf0.001", "documents")
    eval_docs = partitioning.hash_sample(docs, "doc_id", 0.05, salt="eval")
    src = str(tmp_path / "docs_chunks")
    docs.withColumn("_b", F.col("doc_id") % 3).repartition(3, "_b").drop(
        "_b"
    ).write.parquet(src)
    root = str(tmp_path / "wh")
    q = sc.stream_curate(
        spark, src, root, str(tmp_path / "ckpt"), eval_docs,
        min_overlap=10, max_files_per_trigger=1, audit_rejects=True,
    )
    q.awaitTermination()
    curated = read_table(spark, root, sc.CURATED_TABLE)
    rejects = read_table(spark, root, sc.REJECTS_TABLE)
    assert rejects is not None and rejects.count() > 0
    # partition: every input doc is either curated or audited, never both
    assert _ids(curated) | _ids(rejects) == _ids(docs)
    assert not (_ids(curated) & _ids(rejects))
    n = rejects.count()
    # replay the whole stream on the same checkpoint: no growth
    q2 = sc.stream_curate(
        spark, src, root, str(tmp_path / "ckpt"), eval_docs,
        min_overlap=10, max_files_per_trigger=1, audit_rejects=True,
    )
    q2.awaitTermination()
    assert read_table(spark, root, sc.REJECTS_TABLE).count() == n


def test_stream_audit_labels_cross_batch_exact_dup(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and then it sat "
        "down for a long while watching the river run past the mill"
    )
    rows = [
        (1, base + " one", "en", "s", 0),
        (2, base + " one", "en", "s", 0),  # in-batch exact dup of 1
        (3, base + " three", "en", "s", 1),
        (4, base + " one", "en", "s", 1),  # cross-batch exact dup of 1
    ]
    docs = spark.createDataFrame(
        [(d, t, "en", "s", c) for d, t, _, _, c in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = str(tmp_path / "docs")
    docs.withColumn("_b", F.col("n_chars")).repartition(2, "_b").drop(
        "_b"
    ).write.parquet(src)
    # n_chars column doubles as the chunk id; rewrite per-chunk files
    import shutil

    shutil.rmtree(src)
    for b in (0, 1):
        docs.filter(F.col("n_chars") == b).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eval_docs = docs.filter(F.lit(False))
    root = str(tmp_path / "wh")
    q = sc.stream_curate(
        spark, src, root, str(tmp_path / "ckpt"), eval_docs,
        min_overlap=10**6, max_files_per_trigger=1, audit_rejects=True,
    )
    q.awaitTermination()
    rejects = {
        r.doc_id: r.stage
        for r in read_table(spark, root, sc.REJECTS_TABLE).collect()
    }
    curated = _ids(read_table(spark, root, sc.CURATED_TABLE))
    assert 1 in curated and 3 in curated
    assert rejects[2] == "exact_dup"
    assert rejects[4] == "exact_dup"


def test_neardup_stream_audit_labels_vetoes(spark, tmp_path):
    from tests.test_streaming_corpus import _distinct_text, _neardup_text

    rows = [
        (1, _neardup_text("alpha"), 0),
        (9, _neardup_text("almond"), 1),   # near-dup of 1, later batch
        (3, _distinct_text("cedar"), 0),
        (5, _distinct_text("delta"), 1),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en", "s", c) for d, t, c in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = str(tmp_path / "docs")
    for b in (0, 1):
        docs.filter(F.col("n_chars") == b).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eval_docs = docs.filter(F.lit(False))
    root = str(tmp_path / "wh")
    q = sc.stream_curate_neardup(
        spark, src, root, str(tmp_path / "ckpt"), eval_docs,
        min_overlap=10**6, max_files_per_trigger=1, audit_rejects=True,
    )
    q.awaitTermination()
    curated = _ids(read_table(spark, root, sc.CURATED_TABLE))
    rejects = {
        r.doc_id: r.stage
        for r in read_table(spark, root, sc.REJECTS_TABLE).collect()
    }
    assert {1, 3, 5} <= curated
    assert rejects.get(9) == "neardup"
    # takedown cascades to the audit table too
    wh = make_sink(
        spark, root, keys={sc.REJECTS_TABLE: ["doc_id"]},
        backend="manifest",
    )
    sc.takedown(wh, spark.createDataFrame([(9,)], "doc_id long"))
    left = read_table(spark, root, sc.REJECTS_TABLE)
    assert left is None or 9 not in _ids(left)
