"""Streaming IVF index: train → micro-batched ingest → partition-pruned
serve. Asserts stream-served results ≡ the in-flight ``ann_ivf_topk``
over the same vectors and centroids, replay idempotency, and that the
serve scan physically reads ONLY the probed cell directories."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
    ann_ivf_topk,
    kmeans_centroids,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
    INDEX_TABLE,
    index_warehouse,
    ivf_index_topk,
    probe_cells_for,
    stream_index_embeddings,
)

K_CELLS = 4
N_PROBE = 2
TOP_K = 3
NUM_QUERIES = 6


def _ingest(spark, sf_dir, tmp_path, chunks=3):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=K_CELLS, iters=2)
    src = str(tmp_path / "chunks")
    emb.withColumn("_b", F.col("vec_id") % chunks).repartition(
        chunks, "_b"
    ).drop("_b").write.parquet(src)
    q = stream_index_embeddings(
        spark,
        src,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        cents,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    return emb, cents


def test_stream_served_equals_batch_ivf(spark, sf_dir, tmp_path):
    emb, cents = _ingest(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = ivf_index_topk(
        spark, str(tmp_path / "index"), queries, cents, k=TOP_K, n_probe=N_PROBE
    )
    batch = ann_ivf_topk(
        emb,
        num_queries=NUM_QUERIES,
        k=TOP_K,
        n_centroids=K_CELLS,
        n_probe=N_PROBE,
        centroids=cents,
    )
    s = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in served.collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in batch.collect()}
    assert s == b and s


def test_replay_is_noop(spark, sf_dir, tmp_path):
    emb, cents = _ingest(spark, sf_dir, tmp_path)
    wh = index_warehouse(spark, str(tmp_path / "index"))
    before = wh.read(INDEX_TABLE).count()
    assert before == emb.count()
    # same source, FRESH checkpoint: every batch replays, the
    # insert-if-absent sink must admit nothing new
    q = stream_index_embeddings(
        spark,
        str(tmp_path / "chunks"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt2"),
        cents,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert wh.read(INDEX_TABLE).count() == before


def test_serve_scan_reads_only_probed_cells(spark, sf_dir, tmp_path):
    emb, cents = _ingest(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe = {
        r["cell"]
        for r in probe_cells_for(queries, cents, N_PROBE)
        .select("cell")
        .distinct()
        .collect()
    }
    assert len(probe) < K_CELLS, "probe set must be a strict subset"
    served = ivf_index_topk(
        spark, str(tmp_path / "index"), queries, cents, k=TOP_K, n_probe=N_PROBE
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    # identify the index scan by its partition column in the read
    # schema (plan lines truncate long tmp paths)
    scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "cell#" in ln
    ]
    assert scans, "no index FileScan in plan"
    import re

    for ln in scans:
        m = re.search(r"PartitionFilters: \[[^\]]*IN \(([0-9,]+)\)", ln)
        assert m, f"index scan without a static cell IN partition filter: {ln}"
        assert set(map(int, m.group(1).split(","))) == probe
