"""Unit tests for time-dimension derivation (SURVEY §2.8 F1-F8):
known dates incl. ISO-week edges and weekend boundaries, matching the
reference's java.time behavior (src/Meshjoin.java:303-318)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.functions.time import (
    time_dimension,
    with_time_attributes,
)

CASES = [
    # ts, year, month, day, week(ISO), quarter, day_name, is_weekend, season
    ("2019-01-05 10:30:00", 2019, 1, 5, 1, 1, "SATURDAY", True, "Winter"),
    ("2019-01-06 00:00:00", 2019, 1, 6, 1, 1, "SUNDAY", True, "Winter"),
    ("2019-01-07 00:00:00", 2019, 1, 7, 2, 1, "MONDAY", False, "Winter"),
    # ISO week edge: Dec 31 2018 belongs to ISO week 1 of 2019
    ("2018-12-31 23:59:59", 2018, 12, 31, 1, 4, "MONDAY", False, "Winter"),
    # ISO week edge: Jan 1 2016 belongs to ISO week 53 of 2015
    ("2016-01-01 00:00:00", 2016, 1, 1, 53, 1, "FRIDAY", False, "Winter"),
    ("2019-04-15 12:00:00", 2019, 4, 15, 16, 2, "MONDAY", False, "Spring"),
    ("2019-07-04 12:00:00", 2019, 7, 4, 27, 3, "THURSDAY", False, "Summer"),
    ("2019-10-31 12:00:00", 2019, 10, 31, 44, 4, "THURSDAY", False, "Fall"),
    ("2019-12-01 12:00:00", 2019, 12, 1, 48, 4, "SUNDAY", True, "Winter"),
    # leap day
    ("2020-02-29 06:00:00", 2020, 2, 29, 9, 1, "SATURDAY", True, "Winter"),
]


@pytest.fixture(scope="module")
def derived(spark):
    df = spark.createDataFrame(
        [(c[0],) for c in CASES], "order_date_raw string"
    ).select(F.to_timestamp("order_date_raw").alias("order_date"))
    return {
        str(r.order_date): r for r in with_time_attributes(df).collect()
    }


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_time_attributes(derived, case):
    ts, year, month, day, week, quarter, day_name, weekend, season = case
    r = derived[ts]
    assert (r.year, r.month, r.day, r.week, r.quarter) == (
        year, month, day, week, quarter,
    )
    assert r.day_name == day_name
    assert r.is_weekend is weekend
    assert r.season == season


def test_time_dimension_dedup(spark):
    df = spark.createDataFrame(
        [("2019-01-05 10:30:00",), ("2019-01-05 10:30:00",), ("2019-01-06 00:00:00",)],
        "raw string",
    ).select(F.to_timestamp("raw").alias("order_date"))
    td = time_dimension(df)
    assert td.count() == 2
    assert td.filter(F.col("time_id").isNull()).count() == 0
