"""Corpus partitioning utilities: hash-sample stability under
repartitioning, distributed global ranks vs the naive window, shard
balance, and the no-global-window plan guard."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    partitioning,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)


def test_hash_sample_is_partitioning_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    a = {r.doc_id for r in partitioning.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in partitioning.hash_sample(
            docs.repartition(13), "doc_id", 0.3
        ).collect()
    }
    assert a == b and a  # same members regardless of layout
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # rate in the right ballpark


def test_hash_sample_salts_are_independent_windows(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    train = partitioning.hash_sample(docs, "doc_id", 0.5, salt="train")
    val = partitioning.hash_sample(docs, "doc_id", 0.5, salt="val")
    t = {r.doc_id for r in train.collect()}
    v = {r.doc_id for r in val.collect()}
    assert t != v  # different salts draw different members


def test_global_row_numbers_match_naive_window(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    got = partitioning.global_row_numbers(
        docs, [F.col("n").desc(), F.col("doc_id").asc()], num_partitions=7
    )
    naive = docs.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("doc_id"))) - 1,
    )
    assert {(r.doc_id, r.rn) for r in got.collect()} == {
        (r.doc_id, r.rn) for r in naive.collect()
    }


def test_global_row_numbers_plan_has_no_global_window(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    df = partitioning.global_row_numbers(docs, ["doc_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    for line in buf.getvalue().splitlines():
        if "row_number" in line:
            assert "_pid" in line, f"global window found: {line}"


def test_shard_assignments_balance(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    n_shards = 8
    out = partitioning.shard_assignments(docs, n_shards, "n_chars")
    rows = out.collect()
    assert {r.shard for r in rows} == set(range(n_shards))
    per_shard = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + r.n_chars
    # serpentine dealing: every shard's byte total within one max-doc
    # size of every other
    biggest_doc = max(r.n_chars for r in rows)
    assert max(per_shard.values()) - min(per_shard.values()) <= biggest_doc
