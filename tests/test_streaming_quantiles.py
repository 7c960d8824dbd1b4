"""Streaming exact quantiles: stream ≡ batch after replay, and the
per-batch-id merge is idempotent (replay contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.events import (
    value_quantiles,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
    quantiles as sq,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def test_streaming_quantiles_equal_batch_after_replay(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_chunks")
    # three explicit chunk files so the stream sees multiple batches
    ev.withColumn("_b", F.col("event_id") % 3).repartition(3, "_b").drop(
        "_b"
    ).write.parquet(src)
    state = str(tmp_path / "qstate")
    ckpt = str(tmp_path / "qckpt")
    q = sq.stream_value_quantiles(
        spark, src, state, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()
    got = _sorted_rows(sq.quantiles_so_far(spark, state))
    want = _sorted_rows(value_quantiles(ev))
    assert got == want
    # restart on the same checkpoint with no new data: state unchanged
    versions_before = sq._version_dirs(state)
    q2 = sq.stream_value_quantiles(
        spark, src, state, ckpt, max_files_per_trigger=1
    )
    q2.awaitTermination()
    assert sq._version_dirs(state) == versions_before
    assert _sorted_rows(sq.quantiles_so_far(spark, state)) == want


def test_apply_counts_batch_is_idempotent_per_batch_id(spark, tmp_path):
    state = str(tmp_path / "idem_state")
    b0 = spark.createDataFrame(
        [(0, "x", 1.0), (1, "x", 2.0)],
        "event_id long, event_type string, value double",
    )
    b1 = spark.createDataFrame(
        [(2, "x", 2.0), (3, "y", 5.0)],
        "event_id long, event_type string, value double",
    )
    sq.apply_counts_batch(spark, state, b0, 0)
    sq.apply_counts_batch(spark, state, b1, 1)
    once = _sorted_rows(sq.quantiles_so_far(spark, state))
    sq.apply_counts_batch(spark, state, b1, 1)  # replay: must not double
    assert _sorted_rows(sq.quantiles_so_far(spark, state)) == once
    batch_equiv = _sorted_rows(value_quantiles(b0.unionByName(b1)))
    assert once == batch_equiv


def test_quantiles_so_far_empty_before_first_batch(spark, tmp_path):
    out = sq.quantiles_so_far(spark, str(tmp_path / "none"))
    assert out.count() == 0
