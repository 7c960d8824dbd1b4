"""Persisted ANN artifacts (operators.artifacts): save/load
round-trips that reproduce identical assignments/codes, fingerprint
guards in the DatasetBuilder epoch config, and streaming facades
accepting a persisted-centroid path instead of retraining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    artifacts,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.pq import (
    pq_codebooks,
    pq_encode,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
    _kmeans_assign,
    kmeans_centroids,
    scaled_vectors,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_centroids_roundtrip_identical_assignments(
    spark, sf_dir, tmp_path
):
    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, k=4, iters=2)
    path = str(tmp_path / "cent")
    artifacts.save_centroids(cents, path)
    loaded = artifacts.load_centroids(spark, path)
    # bit-identical content -> identical fingerprints
    assert artifacts.centroids_fingerprint(
        loaded
    ) == artifacts.centroids_fingerprint(cents)
    # and identical nearest-centroid assignments over the corpus
    v = scaled_vectors(emb, "embedding", "vec_id").select("vec_id", "q")
    a1 = {
        r["vec_id"]: r["cell"]
        for r in _kmeans_assign(v, cents, "vec_id").collect()
    }
    a2 = {
        r["vec_id"]: r["cell"]
        for r in _kmeans_assign(v, loaded, "vec_id").collect()
    }
    assert a1 == a2 and a1


def test_codebooks_roundtrip_identical_codes(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).limit(200)
    books = pq_codebooks(emb, m=4, ksub=8, iters=1)
    path = str(tmp_path / "books")
    artifacts.save_codebooks(books, path)
    loaded = artifacts.load_codebooks(spark, path)
    assert artifacts.codebooks_fingerprint(
        loaded
    ) == artifacts.codebooks_fingerprint(books)
    c1 = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb, books, m=4).collect()
    }
    c2 = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb, loaded, m=4).collect()
    }
    assert c1 == c2 and c1


def test_artifacts_are_immutable(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, k=4, iters=1)
    path = str(tmp_path / "cent")
    artifacts.save_centroids(cents, path)
    with pytest.raises(Exception):  # mode("error") refuses overwrite
        artifacts.save_centroids(cents, path)


def test_load_validates_corruption(spark, tmp_path):
    # duplicate centroid key
    bad = spark.createDataFrame(
        [(1, [1, 2], 5), (1, [3, 4], 25)],
        "centroid_id long, cq array<long>, cn long",
    )
    bad.write.parquet(str(tmp_path / "cent"))
    with pytest.raises(ValueError, match="distinct centroid_id"):
        artifacts.load_centroids(spark, str(tmp_path / "cent"))
    # non-dense codebook codes
    badb = spark.createDataFrame(
        [(0, 0, [1]), (0, 2, [2])],
        "subspace int, code int, cq array<long>",
    )
    badb.write.parquet(str(tmp_path / "books"))
    with pytest.raises(ValueError, match="dense"):
        artifacts.load_codebooks(spark, str(tmp_path / "books"))


def test_fingerprint_order_insensitive_content_sensitive(
    spark, sf_dir
):
    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, k=4, iters=2)
    shuffled = cents.orderBy(F.rand(7))
    assert artifacts.centroids_fingerprint(
        shuffled
    ) == artifacts.centroids_fingerprint(cents)
    changed = cents.withColumn("cn", F.col("cn") + 1)
    assert artifacts.centroids_fingerprint(
        changed
    ) != artifacts.centroids_fingerprint(cents)


def test_builder_guard_refuses_changed_ann_artifacts(
    spark, sf_dir, tmp_path
):
    """Rebuilding an epoch with retrained centroids/codebooks must
    raise — exactly like a changed tokenizer or DSIR target."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.corpus_pipeline import (
        CorpusPipeline,
        DatasetBuilder,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_docs = docs.filter("doc_id % 50 = 0").select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, k=4, iters=2)
    builder = DatasetBuilder(
        CorpusPipeline(spark, str(tmp_path / "wh"))
    )
    snap = builder.build(
        docs, eval_docs, budget_docs=50, epoch=0, ann_centroids=cents
    )
    assert snap is not None
    # identical artifact: legitimate replay, allowed
    builder.build(
        docs, eval_docs, budget_docs=50, epoch=0, ann_centroids=cents
    )
    # the artifact was persisted next to the dataset and re-loads
    fp = artifacts.centroids_fingerprint(cents)
    reloaded = builder.load_ann_centroids(fp)
    assert artifacts.centroids_fingerprint(reloaded) == fp
    # retrained (different) centroids: refused
    other = kmeans_centroids(emb, k=5, iters=1)
    with pytest.raises(ValueError, match="different config"):
        builder.build(
            docs, eval_docs, budget_docs=50, epoch=0, ann_centroids=other
        )


def test_streaming_facade_accepts_persisted_centroid_path(
    spark, sf_dir, tmp_path
):
    """stream_index_embeddings(centroids=<path>) serves identically
    to the in-session relation — the retrain-free restart path."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
        ivf_index_topk,
        stream_index_embeddings,
    )

    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, k=4, iters=2)
    cpath = str(tmp_path / "cent")
    artifacts.save_centroids(cents, cpath)
    src = str(tmp_path / "chunks")
    emb.withColumn("_b", F.col("vec_id") % 2).repartition(2, "_b").drop(
        "_b"
    ).write.parquet(src)
    q = stream_index_embeddings(
        spark,
        src,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        cpath,  # persisted artifact path, not a DataFrame
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served_path = ivf_index_topk(
        spark, str(tmp_path / "index"), queries, cpath, k=3, n_probe=2
    )
    served_rel = ivf_index_topk(
        spark, str(tmp_path / "index"), queries, cents, k=3, n_probe=2
    )
    sp = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in served_path.collect()
    }
    sr = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in served_rel.collect()
    }
    assert sp == sr and sp


def test_lm_counts_roundtrip_identical_scores(spark, sf_dir, tmp_path):
    """The trained n-gram model persists/reloads with identical
    fluency scores — the last trained artifact in the engine
    (BPE merges, centroids, codebooks, now the LM count table)."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
        bigram_lm_counts,
        lm_surprisal_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    counts = bigram_lm_counts(docs)
    path = str(tmp_path / "lm")
    artifacts.save_lm_counts(counts, path)
    loaded = artifacts.load_lm_counts(spark, path)
    assert artifacts.lm_fingerprint(loaded) == artifacts.lm_fingerprint(
        counts
    )
    s1 = {
        r["doc_id"]: (r["n_bigrams"], r["mean_invp_scaled"])
        for r in lm_surprisal_stats(docs, lm_counts=counts).collect()
    }
    s2 = {
        r["doc_id"]: (r["n_bigrams"], r["mean_invp_scaled"])
        for r in lm_surprisal_stats(docs, lm_counts=loaded).collect()
    }
    assert s1 == s2 and s1


def test_lm_counts_load_validates(spark, tmp_path):
    bad = spark.createDataFrame(
        [("the", "cat", 2), ("the", "cat", 3)],
        "ctx string, w string, c2 long",
    )
    bad.write.parquet(str(tmp_path / "lm"))
    with pytest.raises(ValueError, match="distinct"):
        artifacts.load_lm_counts(spark, str(tmp_path / "lm"))


def test_stream_curate_accepts_persisted_lm_path(spark, tmp_path):
    """stream_curate(lm_counts=<artifact path>) gates identically to
    in-session training — the retrain-free restart for the streaming
    fluency gate."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
        read_table,
    )
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
        LM_SCALE,
        bigram_lm_counts,
    )
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
        corpus as sc,
    )

    lm = spark.createDataFrame(
        [(0, "the cat sat on the mat " * 3)], "doc_id long, text string"
    )
    rows = [
        (i, f"the cat sat on the mat r{i}", "en", "s0")
        for i in range(1, 5)
    ] + [
        (i, f"zzq{i} wwk{i} vvt{i} uup{i} qqa{i} ppb{i}", "en", "s0")
        for i in range(10, 14)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    lm_path = str(tmp_path / "lm")
    artifacts.save_lm_counts(bigram_lm_counts(lm), lm_path)
    eval_docs = spark.createDataFrame(
        [(1000, "completely disjoint eval text")],
        "doc_id long, text string",
    )
    cutoff = 5 * LM_SCALE - 1
    root = str(tmp_path / "corpus")
    q = sc.stream_curate(
        spark, src, root, str(tmp_path / "ckpt"), eval_docs,
        quality_min=1, min_overlap=10**6,
        lm_counts=lm_path, max_fluency_invp=cutoff,
    )
    q.awaitTermination()
    got = {
        r["doc_id"]
        for r in read_table(spark, root, sc.CURATED_TABLE).collect()
    }
    assert got == set(range(1, 5)), got  # gibberish cut, fluent kept
