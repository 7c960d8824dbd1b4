"""Interval-containment join on hand-built rows: boundary
inclusivity, bin-spanning intervals, left-join unmatched points."""

from __future__ import annotations

from datetime import datetime

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.rangejoin import (
    interval_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),  # == interval start
            (2, "k1", _ts("2024-01-01T11:00:00")),  # inside, next bin
            (3, "k1", _ts("2024-01-01T12:00:00")),  # == interval end
            (4, "k1", _ts("2024-01-01T13:00:00")),  # outside
            (5, "k2", _ts("2024-01-01T10:30:00")),  # other key, no interval
        ],
        "pid int, k string, t timestamp",
    )
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"), 7)],
        "k string, lo timestamp, hi timestamp, ival_id int",
    )
    return points, intervals


def test_inner_interval_join(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, on=["k"], point_time="t",
        interval_start="lo", interval_end="hi",
    )
    got = {r.pid: r.ival_id for r in out.collect()}
    assert got == {1: 7, 2: 7, 3: 7}


def test_left_interval_join_keeps_unmatched(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, on=["k"], point_time="t",
        interval_start="lo", interval_end="hi", how="left",
    )
    got = {r.pid: r.ival_id for r in out.collect()}
    assert got == {1: 7, 2: 7, 3: 7, 4: None, 5: None}


def test_left_join_with_null_interval_payload(spark):
    """A legitimately NULL interval payload column must not be
    misread as 'unmatched' (regression: match detection used
    isNotNull on the first payload column)."""
    points, _ = _frames(spark)
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"), None)],
        "k string, lo timestamp, hi timestamp, ival_id int",
    )
    out = interval_join(
        points, intervals, on=["k"], point_time="t",
        interval_start="lo", interval_end="hi", how="left",
    )
    rows = out.collect()
    # matched points (1,2,3) appear exactly once each with the null
    # payload; unmatched (4,5) exactly once — no collapsing, no dupes
    assert sorted(r.pid for r in rows) == [1, 2, 3, 4, 5]
    assert all(r.ival_id is None for r in rows)
    assert {r.pid for r in rows if r.lo is not None} == {1, 2, 3}


def test_left_join_preserves_duplicate_points_and_null_keys(spark):
    points = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:30:00")),
            (1, "k1", _ts("2024-01-01T10:30:00")),  # exact duplicate row
            (2, None, _ts("2024-01-01T10:30:00")),  # null key
        ],
        "pid int, k string, t timestamp",
    )
    intervals = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"), 7)],
        "k string, lo timestamp, hi timestamp, ival_id int",
    )
    out = interval_join(
        points, intervals, on=["k"], point_time="t",
        interval_start="lo", interval_end="hi", how="left",
    )
    rows = sorted(out.collect(), key=lambda r: (r.pid, r.ival_id or 0))
    # both duplicate rows matched; the null-key point survives unmatched
    assert [(r.pid, r.ival_id) for r in rows] == [(1, 7), (1, 7), (2, None)]
