"""Round-2 robustness fixes: pct-change zero-base guard (engine-
divergent edge), asof_join reserved-name guard, fact-cache keying."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.asof import (
    asof_join,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.oracles import (
    _sql_pct_change,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.queries import (
    _pct_change_2dp,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans import star


CASES = [
    (1234, 1000),   # +23.4%
    (1000, 1234),   # negative change
    (0, 1000),      # -100%
    (1000, 0),      # zero base -> defined NULL on both engines
    (0, 0),         # zero over zero -> NULL
    (1, 3),         # rounding path
]


def test_pct_change_zero_base_matches_oracle(spark):
    df = spark.createDataFrame(CASES, "cur long, prev long").select(
        "cur", "prev", _pct_change_2dp("cur", "prev").alias("pct")
    )
    got = {(r.cur, r.prev): r.pct for r in df.collect()}

    con = duckdb.connect()
    expr = _sql_pct_change("cur", "prev")
    for cur, prev in CASES:
        (want,) = con.execute(
            f"SELECT {expr} FROM (SELECT {cur}::BIGINT cur, {prev}::BIGINT prev)"
        ).fetchone()
        assert got[(cur, prev)] == want, (cur, prev)
    assert got[(1000, 0)] is None and got[(0, 0)] is None


def test_asof_join_rejects_reserved_columns(spark):
    left = spark.createDataFrame([(1, 1, 2)], "k long, t long, _prio long")
    right = spark.createDataFrame([(1, 1, 5)], "k long, rt long, v long")
    with pytest.raises(AssertionError, match="_prio"):
        asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                  right_cols={"v": "v_out"})


def test_fact_cache_keyed_by_application(spark, sf_dir):
    star.clear_fact_cache()
    a = star.sales_fact(spark, sf_dir)
    b = star.sales_fact(spark, sf_dir)
    assert a is b  # memoized within one application
    app_id = spark.sparkContext.applicationId
    # one cache entry serves BOTH line-grain and order-grain views
    # (r14: the line_no variants share a single materialization)
    assert (app_id, sf_dir, True) in star._FACT_CACHE
    assert (
        star.sales_fact(spark, sf_dir, line_no=True)
        is star.sales_fact(spark, sf_dir, line_no=True)
    )
    assert "line_no" not in a.columns
    star.clear_fact_cache()
    assert not star._FACT_CACHE
    # repopulating after a clear still works
    assert star.sales_fact(spark, sf_dir).columns == a.columns
