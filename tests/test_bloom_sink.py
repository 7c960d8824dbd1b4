"""Bloom-prefiltered sink specifics, beyond the shared backend
contract suite (tests/test_sinks.py): the novelty bypass must actually
skip the seen-scan, replays must take the exact path, and both crash
orderings must stay idempotent."""

from __future__ import annotations

import shutil

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    bloom,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
    BloomedAntiJoinSink,
    make_sink,
)


def _sink(spark, root) -> BloomedAntiJoinSink:
    return make_sink(
        spark, str(root), keys={"t": ["k"]}, backend="bloom"
    )


def _rows(sink):
    return {(r["k"], r["v"]) for r in sink.read("t").collect()}


# ---------------------------------------------------------------- bloom.py


def test_bloom_has_no_false_negatives(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    bw = bloom.bloom_words(df, ["k"], m_bits=1 << 14)
    flagged = bloom.with_maybe_seen(df, ["k"], bw)
    assert flagged.filter("NOT maybe_seen").count() == 0


def test_bloom_merge_covers_both_sides(spark):
    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i,) for i in range(100, 150)], "k long")
    m = bloom.merge_blooms(
        bloom.bloom_words(a, ["k"], m_bits=1 << 14),
        bloom.bloom_words(b, ["k"], m_bits=1 << 14),
    )
    both = a.unionByName(b)
    assert (
        bloom.with_maybe_seen(both, ["k"], m)
        .filter("NOT maybe_seen")
        .count()
        == 0
    )
    assert m.first()["n_keys"] == 150


def test_bloom_null_and_multicolumn_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, None)], "k1 int, k2 string"
    )
    bw = bloom.bloom_words(df, ["k1", "k2"], m_bits=1 << 14)
    assert (
        bloom.with_maybe_seen(df, ["k1", "k2"], bw)
        .filter("NOT maybe_seen")
        .count()
        == 0
    )


def test_bloom_discriminates_at_sane_density(spark):
    seen = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    bw = bloom.bloom_words(seen, ["k"], m_bits=1 << 17)
    unseen = spark.createDataFrame(
        [(i,) for i in range(10_000, 11_000)], "k long"
    )
    fp = bloom.with_maybe_seen(unseen, ["k"], bw).filter("maybe_seen").count()
    assert fp <= 20  # ~2% at 1k keys in 2^17 bits, deterministic hashes


# ------------------------------------------------------------- sink paths


def test_novel_batch_skips_seen_scan(spark, tmp_path, monkeypatch):
    sink = _sink(spark, tmp_path)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.insert_if_absent("t", b1)

    def boom(*a, **kw):  # the exact path must NOT run for novel keys
        raise AssertionError("seen-scan executed for a provably-novel batch")

    monkeypatch.setattr(BloomedAntiJoinSink, "_existing_keys", boom)
    b2 = spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string")
    sink.insert_if_absent("t", b2)
    assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}


def test_replay_takes_exact_path_and_noops(spark, tmp_path, monkeypatch):
    sink = _sink(spark, tmp_path)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.insert_if_absent("t", b1)
    calls = []
    # the exact check is the inverted broadcast form: it scopes the
    # existing table via _scoped_existing (never the full-shuffle
    # _existing_keys path the plain backend uses)
    orig = BloomedAntiJoinSink._scoped_existing

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(BloomedAntiJoinSink, "_scoped_existing", spy)
    sink.insert_if_absent("t", b1)  # at-least-once replay
    assert calls, "replayed keys must go through the exact anti-join"
    assert _rows(sink) == {(1, "a"), (2, "b")}


def test_crash_after_bloom_before_data_is_safe(spark, tmp_path):
    # superset ordering: the bloom may contain keys whose data append
    # crashed — those keys are "maybe seen", the exact check finds
    # nothing, and the retry inserts them exactly once
    sink = _sink(spark, tmp_path)
    sink.insert_if_absent(
        "t", spark.createDataFrame([(1, "a")], "k long, v string")
    )
    b2 = spark.createDataFrame([(2, "b"), (3, "c")], "k long, v string")
    # simulate: bloom write succeeded, data append crashed
    sink._write_bloom(
        "t",
        bloom.merge_blooms(
            sink._read_bloom("t"),
            bloom.bloom_words(b2, ["k"], sink.bloom_bits, sink.bloom_k),
        ),
    )
    sink.insert_if_absent("t", b2)  # the retry
    sink.insert_if_absent("t", b2)  # and an at-least-once replay
    assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c")}


def test_missing_bloom_rebuilds_from_table(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.insert_if_absent("t", b1)
    shutil.rmtree(sink._bloom_dir("t"))  # crash mid-overwrite
    sink.insert_if_absent("t", b1)  # replay against rebuilt bloom
    assert _rows(sink) == {(1, "a"), (2, "b")}
    # and the rebuilt bloom still proves novelty for new keys
    sink.insert_if_absent(
        "t", spark.createDataFrame([(3, "c")], "k long, v string")
    )
    assert _rows(sink) == {(1, "a"), (2, "b"), (3, "c")}


def test_saturated_bloom_stays_correct(spark, tmp_path):
    # a deliberately tiny filter: everything collides to "maybe seen",
    # the sink degrades to the plain anti-join — never duplicates
    sink = make_sink(
        spark, str(tmp_path), keys={"t": ["k"]}, backend="bloom"
    )
    sink.bloom_bits = 64
    sink.bloom_k = 2
    b1 = spark.createDataFrame(
        [(i, "x") for i in range(50)], "k long, v string"
    )
    sink.insert_if_absent("t", b1)
    sink.insert_if_absent("t", b1)
    b2 = spark.createDataFrame(
        [(i, "y") for i in range(40, 90)], "k long, v string"
    )
    sink.insert_if_absent("t", b2)
    got = {(r["k"], r["v"]) for r in sink.read("t").collect()}
    assert len(got) == 90
    assert all(v == "x" for k, v in got if k < 50)


def test_bloom_auto_grows_past_saturation(spark, tmp_path):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bloom import (
        bloom_meta,
    )

    sink = make_sink(spark, str(tmp_path), keys={"t": ["k"]}, backend="bloom")
    sink.bloom_bits = 256  # tiny start: 100 keys saturate it at once
    b1 = spark.createDataFrame(
        [(i, "x") for i in range(100)], "k long, v string"
    )
    sink.insert_if_absent("t", b1)
    m0, _, n0 = bloom_meta(sink._read_bloom("t"))
    assert m0 == 256 and n0 == 100
    b2 = spark.createDataFrame(
        [(i, "y") for i in range(100, 200)], "k long, v string"
    )
    sink.insert_if_absent("t", b2)  # triggers the growth rebuild
    m1, _, n1 = bloom_meta(sink._read_bloom("t"))
    assert m1 >= 100 * 20  # ≥ 2× headroom over the pre-batch keys
    assert sink.read("t").count() == 200
    # grown filter still proves novelty and still veto-replays
    sink.insert_if_absent("t", b2)
    assert sink.read("t").count() == 200
    got = {(r["k"], r["v"]) for r in sink.read("t").collect()}
    assert all(v == "y" for k, v in got if k >= 100)
