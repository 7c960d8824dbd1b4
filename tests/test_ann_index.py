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
    # ONE query: its probe set is <= N_PROBE cells, necessarily a
    # strict subset of K_CELLS (two queries could legitimately cover
    # all 4 cells now that md5 seeding decorrelates the centroids
    # from the low ids)
    queries = emb.filter(F.col("vec_id") < 1).select(
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


def test_auto_compaction_bounds_live_segments(spark, sf_dir, tmp_path):
    """10 micro-batches with auto_compact_segments=3: the live segment
    count stays bounded across multiple compaction rounds, every batch
    snapshot id survives, serving on the compacted cell layout is
    identical to the in-flight ``ann_ivf_topk``, the partition-pruning
    plan guard still holds, and a full replay stays a no-op."""
    import re

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=K_CELLS, iters=2)
    src = str(tmp_path / "chunks")
    chunks = 10
    # exactly one file per chunk -> exactly 10 micro-batches (hash
    # repartition can collide buckets and yield fewer files)
    for i in range(chunks):
        emb.filter(F.col("vec_id") % chunks == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    root = str(tmp_path / "index")
    q = stream_index_embeddings(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        cents,
        max_files_per_trigger=1,
        auto_compact_segments=3,
    )
    q.awaitTermination()
    wh = index_warehouse(spark, root)
    live, all_nums, _ = wh._segments(INDEX_TABLE)
    # bound 3 → compact whenever live exceeds it → never ends above 4
    assert len(live) <= 4
    assert any(covers is not None for _, _, covers in live)
    # 10 batch snapshots + 3 compaction snapshots, all preserved
    assert len(all_nums) == 13
    assert wh.read(INDEX_TABLE).count() == emb.count()
    # serve ≡ batch over the compacted layout
    queries = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = ivf_index_topk(
        spark, root, queries, cents, k=TOP_K, n_probe=N_PROBE
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
    # pruning guard on the compacted segment: one query's probe set is
    # a strict subset of the cells and every index scan carries it
    one = emb.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe = {
        r["cell"]
        for r in probe_cells_for(one, cents, N_PROBE)
        .select("cell")
        .distinct()
        .collect()
    }
    assert len(probe) < K_CELLS
    plan = (
        ivf_index_topk(spark, root, one, cents, k=TOP_K, n_probe=N_PROBE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "cell#" in ln
    ]
    assert scans, "no index FileScan in plan"
    for ln in scans:
        m = re.search(r"PartitionFilters: \[[^\]]*IN \(([0-9,]+)\)", ln)
        assert m, f"index scan without a static cell IN partition filter: {ln}"
        assert set(map(int, m.group(1).split(","))) == probe
    # fresh checkpoint, same source: replay through the compacted
    # table admits nothing (the anti-join sees compacted keys)
    q = stream_index_embeddings(
        spark,
        src,
        root,
        str(tmp_path / "ckpt2"),
        cents,
        max_files_per_trigger=1,
        auto_compact_segments=3,
    )
    q.awaitTermination()
    assert wh.read(INDEX_TABLE).count() == emb.count()


class TestStreamingEmbeddingDedup:
    @staticmethod
    def _clone_corpus(spark):
        # ids 0..5 seed distinct directions; clones of 0 and 2 arrive
        # later (higher ids, possibly later batches)
        import math

        def unit(i):
            v = [0.0] * 8
            v[i % 8] = 1.0
            v[(i + 3) % 8] = 0.5
            n = math.sqrt(1.25)
            return [x / n for x in v]

        rows = [(i, unit(i), 0) for i in range(6)]
        rows.append((10, unit(0), 0))  # clone of 0
        rows.append((11, unit(2), 0))  # clone of 2
        rows.append((12, unit(0), 0))  # another clone of 0
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def _run(self, spark, tmp_path, emb, chunks, name):
        from pyspark.sql import functions as F
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
            kmeans_centroids,
        )
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            stream_index_embeddings_dedup,
        )

        cents = kmeans_centroids(emb, k=4, iters=2)
        src = str(tmp_path / f"src_{name}")
        emb.withColumn("_b", F.col("vec_id") % chunks).repartition(
            chunks, "_b"
        ).drop("_b").write.parquet(src)
        q = stream_index_embeddings_dedup(
            spark,
            src,
            str(tmp_path / f"index_{name}"),
            str(tmp_path / f"ckpt_{name}"),
            cents,
            threshold=0.999,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        return str(tmp_path / f"index_{name}")

    def test_first_arrival_wins_and_replay_noop(self, spark, tmp_path):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            INDEX_TABLE,
            index_warehouse,
            stream_index_embeddings_dedup,
        )
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
            kmeans_centroids,
        )

        emb = self._clone_corpus(spark)
        root = self._run(spark, tmp_path, emb, chunks=3, name="a")
        wh = index_warehouse(spark, root)
        got = {r["vec_id"] for r in wh.read(INDEX_TABLE).collect()}
        # exactly one member of each clone family (whichever batch
        # arrived first), every non-clone admitted
        assert len(got & {0, 10, 12}) == 1 and len(got & {2, 11}) == 1
        assert {1, 3, 4, 5} <= got and len(got) == 6
        # fresh checkpoint, same source: pure replay admits nothing new
        cents = kmeans_centroids(emb, k=4, iters=2)
        q = stream_index_embeddings_dedup(
            spark,
            str(tmp_path / "src_a"),
            root,
            str(tmp_path / "ckpt_a2"),
            cents,
            threshold=0.999,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        assert {r["vec_id"] for r in wh.read(INDEX_TABLE).collect()} == got

    def test_admitted_set_invariant_under_batching(self, spark, tmp_path):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            INDEX_TABLE,
            index_warehouse,
        )

        emb = self._clone_corpus(spark)
        r1 = self._run(spark, tmp_path, emb, chunks=1, name="one")
        r3 = self._run(spark, tmp_path, emb, chunks=4, name="four")
        a = {r["vec_id"] for r in index_warehouse(spark, r1).read(INDEX_TABLE).collect()}
        b = {r["vec_id"] for r in index_warehouse(spark, r3).read(INDEX_TABLE).collect()}
        # WHICH family member survives depends on batch arrival order
        # (first arrival wins, exactly as in the MinHash admission);
        # the batching-invariant property is representation: exactly
        # one member per clone family, all non-clones admitted.
        fam_a, fam_b = {0, 10, 12}, {2, 11}
        for got in (a, b):
            assert len(got & fam_a) == 1
            assert len(got & fam_b) == 1
            assert {1, 3, 4, 5} <= got
            assert len(got) == 6
        # single-batch run: min-id component reps are deterministic
        assert a == {0, 1, 2, 3, 4, 5}
