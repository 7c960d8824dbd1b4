"""Typed readers for the reference's three CSV input contracts.

Positional schemas from SURVEY §1.3:
- transactions (src/GenerateStream.java:23-29; field usage
  src/Meshjoin.java:277-278,363-365,414-416):
  Order_ID, Order_Date, Product_ID, Quantity_Ordered, Customer_ID, Time_ID
- products, denormalized 7-col (src/Meshjoin.java:183-203):
  Product_ID, Product_Name, Price, Supplier_ID, Supplier_Name, Store_ID, Store_Name
- customers 3-col (src/Meshjoin.java:224-234):
  Customer_ID, Customer_Name, Gender

The reference splits on bare commas and hand-sanitizes quoted commas
only for store names (src/Meshjoin.java:555-573), corrupting other
quoted fields; we adopt *correct* CSV quote semantics via Spark's
reader (documented deviation, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.time import ORDER_DATE_FORMAT

TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("order_date_raw", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("quantity_ordered_raw", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("time_id", T.StringType()),
    ]
)

PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("price_raw", T.StringType()),
        T.StructField("supplier_id", T.StringType()),
        T.StructField("supplier_name", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("store_name", T.StringType()),
    ]
)

CUSTOMERS_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("gender", T.StringType()),
    ]
)


def _read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def _trim_all(df: DataFrame) -> DataFrame:
    """Reference trims every field (src/Meshjoin.java:94,108)."""
    return df.select(*[F.trim(F.col(c)).alias(c) for c in df.columns])


def read_transactions(spark: SparkSession, path: str) -> DataFrame:
    """Transactions with validity filters + typing.

    Mirrors the reference's skip-on-bad-parse behavior
    (src/GenerateStream.java:35; src/Meshjoin.java:267-284): rows with
    null/blank keys, unparsable quantities or dates are dropped.
    """
    df = _trim_all(_read_csv(spark, path, TRANSACTIONS_SCHEMA))
    # try_* variants: ANSI mode would otherwise raise on malformed
    # input; the reference skips such rows (src/Meshjoin.java:241-261).
    typed = df.select(
        "order_id",
        F.try_to_timestamp(
            F.col("order_date_raw"), F.lit(ORDER_DATE_FORMAT)
        ).alias("order_date"),
        "product_id",
        F.col("quantity_ordered_raw").try_cast("int").alias("quantity_ordered"),
        "customer_id",
        "time_id",
    )
    return typed.filter(
        F.col("order_id").isNotNull()
        & (F.col("order_id") != "")
        & F.col("order_date").isNotNull()
        & F.col("product_id").isNotNull()
        & (F.col("product_id") != "")
        & F.col("quantity_ordered").isNotNull()
        & F.col("customer_id").isNotNull()
        & (F.col("customer_id") != "")
    )


def read_products_master(spark: SparkSession, path: str) -> DataFrame:
    """Denormalized product master; bad-length/bad-price rows skipped
    (src/Meshjoin.java:184-199)."""
    df = _trim_all(_read_csv(spark, path, PRODUCTS_SCHEMA))
    typed = df.withColumn("price", F.col("price_raw").try_cast("double")).drop(
        "price_raw"
    )
    return typed.filter(
        F.col("product_id").isNotNull()
        & (F.col("product_id") != "")
        & F.col("price").isNotNull()
    )


def read_customers_master(spark: SparkSession, path: str) -> DataFrame:
    df = _trim_all(_read_csv(spark, path, CUSTOMERS_SCHEMA))
    return df.filter(F.col("customer_id").isNotNull() & (F.col("customer_id") != ""))
