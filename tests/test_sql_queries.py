"""SQL surface ≡ DataFrame surface: every OLAP query's spark.sql
string reproduces the DataFrame builder's result exactly."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.queries import (
    OLAP_QUERIES,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.sql_queries import (
    SQL_QUERIES,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.star import (
    register_star_views,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    register_views,
)


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)  # raw testdata (lineitem for q00)
    register_star_views(spark, sf_dir)


def test_sql_surface_is_complete():
    assert set(SQL_QUERIES) == set(OLAP_QUERIES)


def _rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_equals_dataframe(spark, sf_dir, name):
    sql_cols, sql_rows = _rows(spark.sql(SQL_QUERIES[name]))
    df_cols, df_rows = _rows(OLAP_QUERIES[name](spark, sf_dir))
    assert sql_cols == df_cols
    assert sql_rows == df_rows
