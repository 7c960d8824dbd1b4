"""Star-schema mapping of the TPC-H-ish testdata onto the reference's
METRO warehouse schema (SQL/Star_Schema_Metro.sql).

Mapping (documented; identical in the DuckDB oracle prelude in
``plans.oracles``):

| METRO table (DDL cite)                      | testdata derivation |
|---------------------------------------------|---------------------|
| Sales_Fact (Star_Schema_Metro.sql:57-73)    | lineitem ⋈ orders (order_date, customer) ⋈ supplier (store) |
| Products  (:33-41)                          | part                |
| Supplier  (:28-31)                          | supplier            |
| Store     (:23-26)                          | nation (a supplier's nation plays the store) |
| Customers (:16-20)                          | customer            |
| TimeDimension (:45-56)                      | derived from o_orderdate (functions.time) |

Measures: the reference stores Total_Revenue as DECIMAL(10,2)
(Star_Schema_Metro.sql:67) computed from doubles rounded per row
(src/Meshjoin.java:724-725). We mirror that with *integer cents*:
``revenue_cents = round(l_extendedprice * (1 - l_discount) * 100)`` as
BIGINT, ``total_revenue = revenue_cents / 100.0``. All money aggregates
sum cents (exact integer math) and divide once — this makes every
aggregate bit-identical across engines and summation orders, which a
float SUM is not (a sum landing within 1e-9 of a half-cent boundary
rounds differently per engine).

Scale notes:
- The fact build is two joins: lineitem⋈orders is a co-partitionable
  equi-join on orderkey (at 100 TB: both sides bucketed/sorted on
  orderkey, no shuffle with bucketed tables); supplier is broadcast.
- Dimensions are tiny relative to the fact — every star join in
  ``plans.queries`` broadcasts them explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.time import with_time_attributes
from ..sources.testdata import table

# The OLAP workload's "specified year" (reference uses 2019,
# SQL/OLAP Queries - Metro.sql:11): testdata spans 1995-2001; 1996 is a
# full year present at every scale factor.
ANALYSIS_YEAR = 1996


def products_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_retailprice").alias("price"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_cents"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("product_type"),
    )


def supplier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
        F.col("s_nationkey").alias("store_id"),
    )


def store_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("store_id"),
        F.col("n_name").alias("store_name"),
    )


def customers_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


# Memoized persisted facts per (application, sf_dir, time_attrs): the
# OLAP workload reuses one materialization of the lineitem⋈orders join
# across all queries instead of re-deriving it per query — the
# single-node stand-in for the bucketed/sorted fact table a cluster
# deployment materializes once (see module docstring). StorageLevel is
# MEMORY_AND_DISK: spills instead of OOM-ing when the fact outgrows
# executor memory. Keyed by applicationId (stable per SparkContext),
# not id(spark) — a stopped session's id() can be recycled by the
# allocator and would hand a new session a DataFrame bound to a dead
# context.
_FACT_CACHE: dict[tuple[str, str, bool], dict[bool, DataFrame]] = {}


def clear_fact_cache() -> None:
    """Unpersist and drop all memoized facts (e.g. between sessions)."""
    for views in _FACT_CACHE.values():
        try:
            views[True].unpersist()
        except Exception:
            pass  # context already stopped
    _FACT_CACHE.clear()


def sales_fact(
    spark: SparkSession,
    sf_dir: str,
    time_attrs: bool = True,
    line_no: bool = False,
) -> DataFrame:
    """The Sales_Fact equivalent.

    Columns: order_id, product_id, supplier_id, store_id, customer_id,
    quantity_ordered, total_revenue, order_date (+ time attributes).
    ``line_no=True`` additionally carries ``l_linenumber`` as
    ``line_no`` — on real TPC-H data (order_id, line_no) is the
    fact's exact line-grain key for sink-backed replays
    (insert-if-absent); NOTE the synthetic testdata does not keep
    (orderkey, linenumber) unique, so replay keys there widen to the
    (order, line, part, supplier, qty, price) tuple that is.

    lineitem⋈orders shuffles on orderkey (co-partitioned at scale via
    bucketing); supplier is broadcast (100 rows at sf0.01 — and even at
    SF100k the supplier dim fits the 64 MB broadcast budget).
    """
    # ONE persisted materialization serves both line-grain and
    # order-grain consumers: the cached relation always carries
    # ``line_no`` (one int column) and the line_no=False view drops
    # it — otherwise the replay rows (q18/q20, line_no=True) would
    # pay a SECOND full fact build + persist that the bench warmup
    # (which materializes the default variant) never covers.
    key = (spark.sparkContext.applicationId, sf_dir, time_attrs)
    cached = _FACT_CACHE.get(key)
    if cached is not None:
        return cached[line_no]
    li = table(spark, sf_dir, "lineitem")  # noqa: E501  (cache decided below)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    line_cols = (
        [F.col("l_linenumber").cast("int").alias("line_no")]
        if line_no or time_attrs
        else []
    )
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_orderkey").alias("order_id"),
            *line_cols,
            F.col("l_partkey").alias("product_id"),
            F.col("l_suppkey").alias("supplier_id"),
            F.col("s_nationkey").alias("store_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("l_quantity").alias("quantity_ordered"),
            F.round(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100, 0
            )
            .cast("long")
            .alias("revenue_cents"),
            F.col("o_orderdate").alias("order_date"),
        )
        .withColumn("total_revenue", F.col("revenue_cents") / 100.0)
    )
    if not time_attrs:
        # narrow-projection consumers (e.g. the Q6 self-join reads two
        # columns) are better served by the column-pruned parquet scan
        # than by a cache of full rows — don't persist this variant
        return fact
    from pyspark import StorageLevel

    # day / week / day_name feed no OLAP query — keep the persisted
    # rows lean (they exist on the ETL warehouse path, not here)
    out = (
        with_time_attributes(fact)
        .drop("day", "week", "day_name")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # both views memoized: line-grain consumers get the persisted
    # relation itself, order-grain consumers a stable dropped view of
    # it — one materialization either way
    _FACT_CACHE[key] = {True: out, False: out.drop("line_no")}
    return _FACT_CACHE[key][line_no]


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the star schema as temp views (V2 equivalent)."""
    sales_fact(spark, sf_dir).createOrReplaceTempView("sales_fact")
    products_dim(spark, sf_dir).createOrReplaceTempView("products")
    supplier_dim(spark, sf_dir).createOrReplaceTempView("suppliers")
    store_dim(spark, sf_dir).createOrReplaceTempView("stores")
    customers_dim(spark, sf_dir).createOrReplaceTempView("customers_dim")
