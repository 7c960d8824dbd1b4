"""Q1-Q10 (+ pricing summary) vs the DuckDB oracle — the local replica
of the driver's t2 correctness gate, run at sf0.001 for speed (the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.oracles import (
    OLAP_ORACLES,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.queries import (
    OLAP_QUERIES,
)

from .oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_query_and_oracle_keys_match():
    assert set(OLAP_QUERIES) == set(OLAP_ORACLES)


@pytest.mark.parametrize("name", sorted(OLAP_QUERIES))
def test_olap_query_matches_oracle(spark, sf_dir, con, name):
    df = OLAP_QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # executes
    compare(df, con, OLAP_ORACLES[name], name)
