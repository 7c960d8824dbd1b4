"""Durable catalog surface — V1/V2 parity with the reference's MySQL
catalog.

The reference persists its star schema DDL
(SQL/Star_Schema_Metro.sql:1-85) and the STORE_QUARTERLY_SALES view
(SQL/OLAP Queries - Metro.sql:276-288) in MySQL's catalog: any later
connection resolves them by name. The Spark twin is a
warehouse-dir-backed metastore (``session.get_spark(catalog_dir=...)``
— Hive/Derby locally, a shared metastore service on a cluster):
``publish_star_schema`` writes the dims + fact as managed parquet
tables and defines the view OVER THE CATALOG TABLES, so a fresh
session pointed at the same catalog dir — days later, different
process — runs ``SELECT ... FROM metro.store_quarterly_sales``
without re-deriving anything.

Scale notes: the fact table is written partitioned by (year, month) —
the same layout ``operators.etl.ParquetWarehouse`` uses — so
catalog-table scans partition-prune exactly like path-based reads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import star

# The view text mirrors plans.sql_queries' q10 (same integer-cents
# money math); it references the CATALOG tables so the definition
# survives the session that created it.
STORE_QUARTERLY_SALES_VIEW = """
    SELECT /*+ BROADCAST(s) */ store_id, store_name, quarter, year,
           SUM(revenue_cents) / 100.0D AS total_quarterly_revenue,
           SUM(quantity_ordered) AS total_quarterly_quantity
    FROM {db}.sales_fact f JOIN {db}.stores s USING (store_id)
    GROUP BY store_id, store_name, quarter, year
"""


def publish_star_schema(
    spark: SparkSession, sf_dir: str, database: str = "metro"
) -> None:
    """Persist the star schema + STORE_QUARTERLY_SALES into the
    session catalog (durable iff the session has a metastore-backed
    catalog — see module docstring)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    (
        star.sales_fact(spark, sf_dir)
        .write.mode("overwrite")
        .partitionBy("year", "month")
        .saveAsTable(f"{database}.sales_fact")
    )
    dims = {
        "products": star.products_dim,
        "suppliers": star.supplier_dim,
        "stores": star.store_dim,
        "customers_dim": star.customers_dim,
    }
    for name, build in dims.items():
        build(spark, sf_dir).write.mode("overwrite").saveAsTable(
            f"{database}.{name}"
        )
    spark.sql(
        f"CREATE OR REPLACE VIEW {database}.store_quarterly_sales AS "
        + STORE_QUARTERLY_SALES_VIEW.format(db=database)
    )
