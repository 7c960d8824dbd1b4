"""Product-quantization behavior tests: crafted vectors with known
codebook structure (the driver's oracle gate covers corpus-scale
parity of ann_ivfpq_topk), plus plan guards for the zero-shuffle
encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    pq,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codebooks_shape_and_determinism(spark):
    rows = [(i, [float(i % 4), float((i + 1) % 4), 0.5, -0.5]) for i in range(20)]
    books = pq.pq_codebooks(_emb(spark, rows), m=2, ksub=4, iters=1)
    got = books.collect()
    assert len(got) == 8  # m * ksub
    assert {r["subspace"] for r in got} == {0, 1}
    assert {r["code"] for r in got if r["subspace"] == 0} == {0, 1, 2, 3}
    assert all(len(r["cq"]) == 2 for r in got)
    again = pq.pq_codebooks(_emb(spark, rows), m=2, ksub=4, iters=1).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_m_must_divide_dim(spark):
    rows = [(0, [1.0, 2.0, 3.0])]
    with pytest.raises(ValueError, match="must divide"):
        pq.pq_codebooks(_emb(spark, rows), m=2, ksub=1)


def test_encode_and_luts_reject_mismatched_m(spark):
    # pq_encode / query_luts are called directly with a caller-supplied
    # m (streaming index builders): a mismatch must raise, not silently
    # truncate the subvector slice against shorter/longer codewords
    rows = [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(8)]
    emb = _emb(spark, rows)
    books = pq.pq_codebooks(emb, m=2, ksub=2, iters=1)
    with pytest.raises(ValueError, match="must divide"):
        pq.pq_encode(emb, books, m=3)
    # m divides dim but disagrees with the trained codebook width
    with pytest.raises(ValueError, match="codebook subvector width"):
        pq.pq_encode(emb, books, m=4)
    qv = (
        pq.scaled_vectors(emb, "embedding", "vec_id")
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qq"),
                F.col("norm_sq").alias("qn"))
    )
    with pytest.raises(ValueError, match="must divide"):
        pq.query_luts(qv, books, m=3)
    with pytest.raises(ValueError, match="codebook subvector width"):
        pq.query_luts(qv, books, m=4)


def test_encode_assigns_nearest_codeword(spark):
    # two obvious groups per subspace; ids 0/1 seed the 2 codewords
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [5.0, 5.0, 0.0, 0.0]),
        (2, [0.1, -0.1, 9.9, 10.1]),   # sub0 ~ id0, sub1 ~ id0
        (3, [4.9, 5.2, 0.2, -0.1]),    # sub0 ~ id1, sub1 ~ id1
        (4, [5.1, 4.8, 10.2, 9.8]),    # sub0 ~ id1, sub1 ~ id0
    ]
    emb = _emb(spark, rows)
    books = pq.pq_codebooks(emb, m=2, ksub=2, iters=2)
    enc = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, books, 2).collect()}
    assert enc[2] == enc[0]
    assert enc[3] == enc[1]
    assert enc[4] == [enc[1][0], enc[0][1]]
    # stored norm is the exact integer micro-unit norm
    norms = {
        r["vec_id"]: r["norm_sq"]
        for r in pq.pq_encode(emb, books, 2).collect()
    }
    assert norms[0] == 2 * (10 * 10**6) ** 2


def test_adc_equals_exact_dot_on_codeword_vectors(spark):
    # vectors that ARE codewords: quantization is lossless, so the
    # ADC cosine must equal the exact cosine and top-1 must be the
    # true nearest neighbor
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 1.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # clone of 0
        (3, [0.0, 1.0, 0.0, 1.0]),  # clone of 1
    ]
    out = pq.ann_ivfpq_topk(
        _emb(spark, rows), num_queries=2, k=1, n_centroids=2,
        n_probe=2, m=2, ksub=2, iters=2,
    ).collect()
    top = {r["query_id"]: (r["neighbor_id"], r["adc_cosine"]) for r in out}
    assert top[0][0] == 2 and top[0][1] == pytest.approx(1.0)
    assert top[1][0] == 3 and top[1][1] == pytest.approx(1.0)


def test_encode_plan_has_no_shuffle(spark):
    rows = [(i, [float(i), 1.0, 0.0, -1.0]) for i in range(12)]
    emb = _emb(spark, rows)
    books = pq.pq_codebooks(emb, m=2, ksub=2, iters=1)
    plan = (
        pq.pq_encode(emb, books, 2)._jdf.queryExecution()
        .executedPlan().toString()
    )
    # one BroadcastExchange (the codebook row) is expected; no
    # shuffle exchange may touch the corpus side
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", ""
    ), plan


class TestPQServedIndex:
    """Streaming IVF-PQ index: code-compressed ingest + ADC serve must
    equal the in-flight ann_ivfpq_topk over the same vectors, trained
    quantizers, and tie-breaks."""

    def _ingest(self, spark, sf_dir, tmp_path, chunks=3):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
            kmeans_centroids,
        )
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            stream_index_embeddings_pq,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = kmeans_centroids(emb, k=4, iters=2)
        books = pq.pq_codebooks(emb, m=4, ksub=8, iters=2)
        src = str(tmp_path / "chunks")
        emb.withColumn("_b", F.col("vec_id") % chunks).repartition(
            chunks, "_b"
        ).drop("_b").write.parquet(src)
        q = stream_index_embeddings_pq(
            spark, src, str(tmp_path / "index"), str(tmp_path / "ckpt"),
            cents, books, m=4, max_files_per_trigger=1,
        )
        q.awaitTermination()
        return emb, cents, books

    def test_stream_served_equals_batch_ivfpq(self, spark, sf_dir, tmp_path):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            ivfpq_index_topk,
        )

        emb, cents, books = self._ingest(spark, sf_dir, tmp_path)
        queries = emb.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        served = ivfpq_index_topk(
            spark, str(tmp_path / "index"), queries, cents, books,
            m=4, k=3, n_probe=2,
        )
        batch = pq.ann_ivfpq_topk(
            emb, num_queries=6, k=3, n_centroids=4, n_probe=2,
            m=4, ksub=8, iters=2, centroids=cents, books=books,
        )
        s = {(r.query_id, r.rank): (r.neighbor_id, r.adc_cosine)
             for r in served.collect()}
        b = {(r.query_id, r.rank): (r.neighbor_id, r.adc_cosine)
             for r in batch.collect()}
        assert s == b and s

    def test_index_stores_codes_not_vectors(self, spark, sf_dir, tmp_path):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            PQ_INDEX_TABLE,
            pq_index_warehouse,
        )

        emb, _, _ = self._ingest(spark, sf_dir, tmp_path)
        idx = pq_index_warehouse(spark, str(tmp_path / "index")).read(
            PQ_INDEX_TABLE
        )
        assert set(idx.columns) == {"vec_id", "codes", "norm_sq", "cell"}
        assert idx.count() == emb.count()
        row = idx.first()
        assert len(row["codes"]) == 4  # m codes, not dim components


def test_grouped_training_identical_to_per_subspace(spark):
    """The fused grouped Lloyd trainer must be numerically identical
    to m independent similarity._kmeans_iterate runs on the slices."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
        _kmeans_iterate,
        scaled_vectors,
    )

    rows = [
        (i, [float((i * 7 + d) % 5) - 2.0 for d in range(8)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, ksub, iters, w = 4, 3, 2, 2
    got = {
        (r["subspace"], r["code"]): tuple(r["cq"])
        for r in pq.pq_codebooks(emb, m, ksub, iters).collect()
    }
    v = scaled_vectors(emb).select("vec_id", "q")
    for j in range(m):
        sub = v.select("vec_id", F.slice("q", j * w + 1, w).alias("q"))
        ref = sorted(
            (r["centroid_id"], tuple(r["cq"]))
            for r in _kmeans_iterate(sub, ksub, iters, "vec_id").collect()
        )
        # pq_codebooks relabels centroid ids to dense codes by rank
        # (md5 seeding leaves arbitrary seed vec_ids); mirror it
        want = {(j, code): cq for code, (_, cq) in enumerate(ref)}
        assert {k: got[k] for k in want} == want


def test_residual_adc_exact_when_residuals_are_zero(spark):
    # every vector IS one of the 4 coarse centroids (ids 0-3 seed
    # k-means with exactly the 4 distinct values, so Lloyd converges
    # to them): residuals are all-zero, every LUT entry is <q_slice,0>
    # = 0, and the residual ADC reduces to <q, c_cell> = <q, x> —
    # bit-identical to the exact cosine top-k, scores included
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        similarity,
    )

    bases = [
        [1.0, 0.0, 0.5, -0.5],
        [0.0, 1.0, -0.5, 0.5],
        [0.5, 0.5, 1.0, 0.0],
        [-0.5, 0.5, 0.0, 1.0],
    ]
    rows = [(i, bases[i % 4]) for i in range(20)]
    emb = _emb(spark, rows)
    got = {
        tuple(r)
        for r in pq.ann_ivfpq_res_topk(
            emb, num_queries=3, k=4, n_centroids=4, n_probe=4,
            m=2, ksub=4, iters=2,
        ).collect()
    }
    want = {
        tuple(r)
        for r in similarity.cosine_topk(emb, num_queries=3, k=4).collect()
    }
    # column orders match: (query_id, neighbor_id, score, rank)
    assert got == want


def test_residual_books_differ_from_raw_books(spark):
    # residual codebooks are trained on q - c_cell; on a corpus with
    # non-trivial spread they must differ from raw codebooks (guards
    # against accidentally wiring the raw trainer into the residual
    # path)
    rows = [
        (i, [float((i * 7) % 13) - 6.0, float((i * 5) % 11) - 5.0,
             float(i % 9) - 4.0, float((i * 3) % 7) - 3.0])
        for i in range(24)
    ]
    emb = _emb(spark, rows)
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, k=4, iters=1)
    raw = {
        (r["subspace"], r["code"], tuple(r["cq"]))
        for r in pq.pq_codebooks(emb, m=2, ksub=4, iters=1).collect()
    }
    res = {
        (r["subspace"], r["code"], tuple(r["cq"]))
        for r in pq.pq_codebooks_residual(
            emb, cents, m=2, ksub=4, iters=1
        ).collect()
    }
    assert raw != res


class TestPQResidualServedIndex:
    """Streaming residual-PQ index (by_residual=True on both ingest
    and serve) must equal the in-flight ann_ivfpq_res_topk over the
    same vectors, quantizers, and tie-breaks."""

    def test_stream_served_equals_batch_residual(
        self, spark, sf_dir, tmp_path
    ):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
            kmeans_centroids,
        )
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.ann_index import (
            ivfpq_index_topk,
            stream_index_embeddings_pq,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = kmeans_centroids(emb, k=4, iters=2)
        books = pq.pq_codebooks_residual(emb, cents, m=4, ksub=8, iters=2)
        src = str(tmp_path / "chunks")
        emb.withColumn("_b", F.col("vec_id") % 3).repartition(
            3, "_b"
        ).drop("_b").write.parquet(src)
        q = stream_index_embeddings_pq(
            spark, src, str(tmp_path / "index"), str(tmp_path / "ckpt"),
            cents, books, m=4, max_files_per_trigger=1, by_residual=True,
        )
        q.awaitTermination()
        queries = emb.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        served = ivfpq_index_topk(
            spark, str(tmp_path / "index"), queries, cents, books,
            m=4, k=3, n_probe=2, by_residual=True,
        )
        batch = pq.ann_ivfpq_res_topk(
            emb, num_queries=6, k=3, n_centroids=4, n_probe=2,
            m=4, ksub=8, iters=2, centroids=cents, books=books,
        )
        s = {(r.query_id, r.rank): (r.neighbor_id, r.adc_cosine)
             for r in served.collect()}
        b = {(r.query_id, r.rank): (r.neighbor_id, r.adc_cosine)
             for r in batch.collect()}
        assert s == b and s
