"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY.md §2 as
  (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: per-query ANSI SQL for the DuckDB side-by-side
  correctness gate (columns aliased identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.queries import (
    OLAP_QUERIES,
    q01_weekend_top_products,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.oracles import (
    OLAP_ORACLES,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.pipeline_queries import (
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Q1 (top weekend revenue products) on sf0.001."""
    return q01_weekend_top_products(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(OLAP_QUERIES)
    out.update(PIPELINE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(OLAP_ORACLES)
    out.update(PIPELINE_ORACLES)
    return out
