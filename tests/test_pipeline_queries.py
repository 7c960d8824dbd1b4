"""Training-data pipeline queries (dedup / similarity / text / events)
vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.pipeline_queries import (
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
)

from .oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_keys_match():
    assert set(PIPELINE_QUERIES) == set(PIPELINE_ORACLES)


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_matches_oracle(spark, sf_dir, con, name):
    df = PIPELINE_QUERIES[name](spark, sf_dir)
    compare(df, con, PIPELINE_ORACLES[name], name)
