"""As-of join semantics on hand-built rows: strict vs non-strict
boundaries, missing matches, per-key isolation, same-time tiebreak."""

from __future__ import annotations

from datetime import datetime

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.asof import (
    asof_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),
            (2, "k1", _ts("2024-01-01T12:00:00")),
            (3, "k2", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "k3", _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        "lid int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T10:00:00"), 100),  # == left lid=1 time
            ("k1", _ts("2024-01-01T11:30:00"), 101),
            ("k1", _ts("2024-01-01T11:30:00"), 102),  # same-time duplicate
            ("k2", _ts("2024-01-01T09:30:00"), 200),
        ],
        "k string, rt timestamp, rid int",
    )
    return left, right


def _run(spark, strict):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        right_cols={"rid": "match_rid"}, strict=strict, tiebreak="rid",
    )
    return {r.lid: r.match_rid for r in out.collect()}


def test_strict_excludes_equal_time(spark):
    got = _run(spark, strict=True)
    assert got == {1: None, 2: 102, 3: None, 4: None}


def test_non_strict_includes_equal_time(spark):
    got = _run(spark, strict=False)
    assert got == {1: 100, 2: 102, 3: None, 4: None}
