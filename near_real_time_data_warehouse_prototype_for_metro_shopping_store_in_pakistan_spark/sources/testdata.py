"""Readers for the driver-provided TPC-H-ish parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Some testdata generations store ``ts`` as TIMESTAMP(NANOS),
    which Spark's parquet reader rejects; others store native
    TIMESTAMP(MICROS). Handle both: read nanos as long and
    floor-convert to a microsecond timestamp (the data has no
    sub-microsecond components; DuckDB's TIMESTAMP_NS->TIMESTAMP cast
    also truncates, so both engines agree), and pass a native
    timestamp column through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(ts_type, TimestampType):
        # TIMESTAMP_NTZ generation: the session timezone is pinned to
        # UTC (session.get_spark), so the cast relabels the same wall
        # clock without shifting the stored microseconds.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` can address
    them with the same names the DuckDB oracle uses."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
