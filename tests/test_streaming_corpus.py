"""Streaming corpus curation: the funnel's gates are stateless maps
and the cross-batch exact dedup lives in the keyed sink, so a chunked
replay must reproduce the batch curation exactly and re-runs must not
grow the table."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    partitioning,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
    corpus as sc,
)


def test_stream_curation_equals_batch(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    eval_docs = partitioning.hash_sample(docs, "doc_id", 0.05, salt="eval")

    src = str(tmp_path / "docs_chunks")
    docs.withColumn("_b", F.col("doc_id") % 3).repartition(3, "_b").drop(
        "_b"
    ).write.parquet(src)
    root = str(tmp_path / "corpus_wh")
    q = sc.stream_curate(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        eval_docs,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    curated = spark.read.parquet(f"{root}/{sc.CURATED_TABLE}")
    batch_kept = sc.curate_batch(docs, eval_docs)
    want_fps = {r.text_fp for r in batch_kept.select("text_fp").distinct().collect()}
    got_fps = {r.text_fp for r in curated.select("text_fp").collect()}
    assert got_fps == want_fps
    # exactly one row per distinct surviving text
    assert curated.count() == len(want_fps)
    assert curated.count() < docs.count()  # the funnel actually cuts

    # re-run on the same checkpoint: no new batches, table unchanged
    n_before = curated.count()
    q2 = sc.stream_curate(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        eval_docs,
        max_files_per_trigger=1,
    )
    q2.awaitTermination()
    assert spark.read.parquet(f"{root}/{sc.CURATED_TABLE}").count() == n_before


def test_curate_batch_gates(spark):
    rows = [
        # passes every gate (needs >=10 tokens, low punct, stopwords)
        (1, "the quick brown fox jumps over the lazy dog and then it sat", "en", "a", 0),
        # duplicate text -> same fingerprint, deduped by the sink
        (2, "the quick brown fox jumps over the lazy dog and then it sat", "en", "a", 0),
        # wrong recorded language -> lang_ok False
        (3, "the quick brown fox jumps over the lazy dog and then it sat", "de", "a", 0),
        # too short -> quality < 100
        (4, "tiny text", "en", "a", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    eval_docs = docs.filter("doc_id = -1")  # empty eval set
    kept = sc.curate_batch(docs, eval_docs).collect()
    assert {r.doc_id for r in kept} == {1, 2}
