"""Event-time streaming: watermarked window rollup and stateful
sessionization equal their batch twins when replaying time-rolled
event files (the standard log-replay contract)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    events as batch_events,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    read_events,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
    windows as sw,
)

FLUSH_TYPE = "_flush"


@pytest.fixture(scope="module")
def event_env(spark, sf_dir, tmp_path_factory):
    """Three time-rolled parquet files: first half, second half, and a
    far-future sentinel event per user. The sentinel advances the
    watermark past every real window and exceeds every session gap, so
    append mode emits all real windows/sessions."""
    d = tmp_path_factory.mktemp("events_stream")
    src = read_events(spark, sf_dir)
    mid, hi = src.select(
        F.expr("percentile(unix_micros(ts), 0.5)").cast("long"),
        (F.max(F.unix_micros("ts"))).cast("long"),
    ).first()
    stream_dir = str(d / "events")
    first = src.filter(F.unix_micros("ts") <= mid)
    second = src.filter(F.unix_micros("ts") > mid)
    flush_us = hi + 365 * 24 * 3600 * 1_000_000
    flush = src.groupBy("user_id").agg(F.max("event_id").alias("event_id")).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        F.timestamp_micros(F.lit(flush_us)).alias("ts"),
        "user_id",
        F.lit(FLUSH_TYPE).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    # write in arrival order so file mod-times give deterministic replay
    for i, part in enumerate([first, second, flush]):
        part.coalesce(1).write.mode("append").parquet(stream_dir)
    return {"dir": stream_dir, "src": src}


def _drain(writer, tmp_path, name):
    q = (
        writer.option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)
    return q


def test_streaming_window_rollup_equals_batch(spark, event_env, tmp_path):
    stream = sw.read_event_stream(spark, event_env["dir"], max_files_per_trigger=1)
    out = sw.streaming_hourly_rollup(stream)
    _drain(out.writeStream, tmp_path, "rollup")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.table("rollup").collect()
        if r.event_type != FLUSH_TYPE
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in batch_events.hourly_rollup(event_env["src"])
        .drop("n_users")
        .collect()
    }
    assert got == expected


def test_streaming_native_session_window_equals_batch(spark, event_env, tmp_path):
    stream = sw.read_event_stream(spark, event_env["dir"], max_files_per_trigger=1)
    out = sw.streaming_session_window_rollup(stream)
    _drain(out.writeStream, tmp_path, "native_sessions")
    # the sentinel's own session never closes (watermark stops at it),
    # so emitted sessions = batch sessions over the original events
    got = sorted(
        (r.user_id, r.session_start, r.session_window_end, r.n_events, r.value_sum)
        for r in spark.table("native_sessions").collect()
    )
    expected = sorted(
        (r.user_id, r.session_start, r.session_window_end, r.n_events, r.value_sum)
        for r in batch_events.session_window_rollup(event_env["src"]).collect()
    )
    assert got == expected


def test_streaming_sessionize_equals_batch(spark, event_env, tmp_path):
    stream = sw.read_event_stream(spark, event_env["dir"], max_files_per_trigger=1)
    out = sw.streaming_sessionize(stream)
    _drain(out.writeStream, tmp_path, "sessions")
    got = sorted(
        (r.user_id, r.session_seq, r.session_start, r.session_end,
         r.n_events, r.value_sum)
        for r in spark.table("sessions").collect()
    )
    # every real session is closed by the sentinel; the sentinel's own
    # session stays open in state and is never emitted
    expected = sorted(
        (r.user_id, r.session_seq, r.session_start, r.session_end,
         r.n_events, r.value_sum)
        for r in batch_events.sessionize(event_env["src"]).collect()
    )
    assert got == expected


def test_sessionize_half_cent_rounding_matches_batch(spark, tmp_path):
    """Exact half-cent values (2.125 → 212.5 cents) must round HALF_UP
    in the streaming sessionizer like the batch twin's F.round —
    pandas .round() is half-even and would emit 212 (regression)."""
    # 2.125 and 2.625 are exact binary doubles whose cent values sit on
    # a true .5 with an EVEN floor neighbor — half-even keeps 212/262,
    # half-up goes 213/263, so they discriminate the rounding rule.
    rows = [
        (1, "2024-01-01 10:00:00", 7, "buy", 2.125),   # 212.5 -> 213
        (2, "2024-01-01 10:01:00", 7, "buy", 2.625),   # 262.5 -> 263
        (3, "2024-01-01 10:02:00", 7, "buy", -2.125),  # -212.5 -> -213
        (4, "2025-01-01 00:00:00", 7, FLUSH_TYPE, 0.0),  # closes the session
    ]
    src = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts_raw string, user_id long, event_type string,"
        "value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts_raw").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    d = str(tmp_path / "halfcent_events")
    src.coalesce(1).write.parquet(d)
    stream = sw.read_event_stream(spark, d)
    _drain(sw.streaming_sessionize(stream).writeStream, tmp_path, "halfcent")
    (row,) = spark.table("halfcent").collect()
    # 213 + 263 - 213 = 263 cents
    assert row.value_sum == 2.63
    (batch_row,) = (
        batch_events.sessionize(src).filter("session_seq = 1").collect()
    )
    assert batch_row.value_sum == row.value_sum
