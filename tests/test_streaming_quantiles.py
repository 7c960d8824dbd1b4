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


def test_state_versions_are_multi_file_manifest_committed(spark, tmp_path):
    """Cluster-safe commit protocol: a version may hold MANY parquet
    files (parallel write, no coalesce(1)), and the commit point is the
    manifest object — no renames anywhere in the merge path."""
    import os

    state = str(tmp_path / "mf_state")
    rows = [(i, "t%d" % (i % 4), float(i % 50)) for i in range(2000)]
    batch = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).repartition(8)
    # AQE legitimately coalesces this tiny state to one partition;
    # disable that here so the write genuinely exercises >1 file.
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        sq.apply_counts_batch(spark, state, batch, 0)
    finally:
        spark.conf.set(key, old)
    (version,) = sq._version_dirs(state)
    vdir = os.path.join(state, f"v{version:09d}")
    files = sq._manifest_files(vdir)
    assert files is not None and len(files) > 1, files
    # read path consumes exactly the manifest files
    got = _sorted_rows(sq.quantiles_so_far(spark, state))
    want = _sorted_rows(value_quantiles(batch))
    assert got == want


def test_uncommitted_version_is_invisible(spark, tmp_path):
    """A crashed half-written version (data files, no manifest) must
    not be read, and a replayed write of it must complete the merge."""
    import os

    state = str(tmp_path / "crash_state")
    b0 = spark.createDataFrame(
        [(0, "x", 1.0), (1, "x", 3.0)],
        "event_id long, event_type string, value double",
    )
    sq.apply_counts_batch(spark, state, b0, 0)
    want = _sorted_rows(sq.quantiles_so_far(spark, state))
    # simulate a crash: v1 directory exists with junk, no manifest
    crashed = os.path.join(state, "v%09d" % 1)
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert sq._version_dirs(state) == [0]
    assert _sorted_rows(sq.quantiles_so_far(spark, state)) == want
    # the replayed batch 1 overwrites the junk and commits
    b1 = spark.createDataFrame(
        [(2, "y", 7.0)], "event_id long, event_type string, value double"
    )
    sq.apply_counts_batch(spark, state, b1, 1)
    assert sq._version_dirs(state) == [0, 1]
    got = _sorted_rows(sq.quantiles_so_far(spark, state))
    assert got == _sorted_rows(value_quantiles(b0.unionByName(b1)))


def test_stale_batch_id_is_refused(spark, tmp_path):
    """Reusing a state dir with a fresh checkpoint (batch ids restart
    at 0) must raise, not silently write an unreadable version."""
    import pytest

    state = str(tmp_path / "stale_state")
    b = spark.createDataFrame(
        [(0, "x", 1.0)], "event_id long, event_type string, value double"
    )
    sq.apply_counts_batch(spark, state, b, 0)
    sq.apply_counts_batch(spark, state, b, 1)
    sq.apply_counts_batch(spark, state, b, 2)  # retention drops v0
    sq.apply_counts_batch(spark, state, b, 2)  # replay of latest: no-op
    assert sq._version_dirs(state) == [1, 2]
    with pytest.raises(ValueError, match="different.*checkpoint"):
        sq.apply_counts_batch(spark, state, b, 0)  # fresh-checkpoint restart
