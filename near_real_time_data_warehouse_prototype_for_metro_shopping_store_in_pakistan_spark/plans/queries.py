"""The reference OLAP workload (SQL/OLAP Queries - Metro.sql Q1-Q10 +
STORE_QUARTERLY_SALES view) as Spark DataFrame builders over the star
mapping in ``plans.star``.

Each builder takes (spark, sf_dir) and returns a DataFrame whose column
names/types match the DuckDB oracle in ``plans.oracles`` exactly (the
driver hash-compares values with columns sorted by name).

Determinism conventions (SURVEY §7 hard parts):
- Money aggregates sum integer cents (``revenue_cents`` /
  ``price_cents`` from plans.star) and divide by 100.0 once — exact
  integer math, bit-identical across engines and summation orders.
  Ratios/averages are computed from those exact values then rounded.
- Every ORDER BY ... LIMIT k carries a full tie-break key.
- Q8 adds ``year`` to the projection (the reference relies on MySQL's
  lax ONLY_FULL_GROUP_BY — SQL/OLAP Queries - Metro.sql:124,247).

Scale notes: every dimension join is an explicit ``broadcast()``; the
only shuffles left are the aggregations' own key exchanges, and top-k
is TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .star import (
    ANALYSIS_YEAR,
    customers_dim,
    products_dim,
    register_star_views,
    sales_fact,
    store_dim,
    supplier_dim,
)

R2 = 2  # money rounding, DECIMAL(10,2) at rest (Star_Schema_Metro.sql:67)


def _money(cents_col: str = "revenue_cents"):
    """Exact money aggregate: SUM(cents)/100.0 (see plans.star)."""
    return F.sum(cents_col) / 100.0


def _pct_change_2dp(cur_cents: str, prev_cents: str):
    """Half-up percent change at 2 dp in pure integer math.

    round((cur-prev)/prev*100, 2) via rounding a computed double is NOT
    cross-engine stable (Spark rounds the shortest decimal repr of the
    double; DuckDB rounds x*10^s). Integer half-up division is:
    sign * ((2*|diff|*10000 + prev) div (2*prev)) / 100.0, prev > 0.
    Spark ``div`` truncates and DuckDB ``//`` floors — identical on the
    non-negative operands used here.

    prev == 0 is defined as NULL (percent change from a zero base is
    undefined) — guarded explicitly because the engines would otherwise
    diverge: Spark ``div`` yields NULL on zero divisors while DuckDB
    ``//`` raises. Mirrored in the oracle (plans.oracles._sql_pct_change)
    and the SQL surface (plans.sql_queries._pct).
    """
    return (
        F.expr(
            f"if({prev_cents} = 0, cast(null as bigint), "
            f"if({cur_cents} >= {prev_cents}, 1, -1) * "
            f"((2 * abs({cur_cents} - {prev_cents}) * 10000 + {prev_cents}) "
            f"div (2 * {prev_cents})))"
        )
        / 100.0
    )


def _fact_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sales_fact(spark, sf_dir).join(
        F.broadcast(products_dim(spark, sf_dir)), "product_id"
    )


# --------------------------------------------------------------------------
# Q1 — top revenue products, weekend/weekday split, monthly drill-down
# (SQL/OLAP Queries - Metro.sql:1-26; joins J5, agg A1, top-k O2)
# --------------------------------------------------------------------------

def _q01(spark: SparkSession, sf_dir: str, weekend: bool) -> DataFrame:
    return (
        _fact_products(spark, sf_dir)
        .filter((F.col("is_weekend") == weekend) & (F.col("year") == ANALYSIS_YEAR))
        .groupBy("month", "product_name")
        .agg(_money().alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("month"), F.asc("product_name"))
        .limit(5)
    )


def q01_weekend_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q01(spark, sf_dir, weekend=True)


def q01_weekday_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q01(spark, sf_dir, weekend=False)


# --------------------------------------------------------------------------
# Q2 — store quarterly revenue growth rate
# (SQL/OLAP Queries - Metro.sql:29-72; CTE self-join J8 re-expressed as
# lag() per SURVEY §2.3 — the INNER JOIN against the previous quarter
# means rows without a previous quarter are dropped)
# --------------------------------------------------------------------------

def q02_store_quarterly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        sales_fact(spark, sf_dir)
        .filter(F.col("year") == ANALYSIS_YEAR)
        .join(F.broadcast(store_dim(spark, sf_dir)), "store_id")
        .groupBy("store_id", "store_name", "quarter")
        .agg(F.sum("revenue_cents").alias("total_cents"))
    )
    w = Window.partitionBy("store_id").orderBy("quarter")
    return (
        revenue.withColumn("prev_cents", F.lag("total_cents").over(w))
        .filter(F.col("prev_cents").isNotNull())
        .select(
            "store_id",
            "store_name",
            "quarter",
            (F.col("total_cents") / 100.0).alias("total_revenue"),
            (F.col("prev_cents") / 100.0).alias("previous_quarter_revenue"),
            _pct_change_2dp("total_cents", "prev_cents").alias(
                "revenue_growth_rate"
            ),
        )
        .orderBy("store_id", "quarter")
    )


# --------------------------------------------------------------------------
# Q3 — supplier sales contribution by store and product
# (SQL/OLAP Queries - Metro.sql:75-95; 4-way star join J6. Note the
# reference sums the product *price* per fact row, not revenue.)
# --------------------------------------------------------------------------

def q03_supplier_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales_fact(spark, sf_dir)
        .join(F.broadcast(store_dim(spark, sf_dir)), "store_id")
        .join(F.broadcast(products_dim(spark, sf_dir)), "product_id")
        .join(
            F.broadcast(
                supplier_dim(spark, sf_dir).select("supplier_id", "supplier_name")
            ),
            "supplier_id",
        )
        .groupBy("store_name", "supplier_name", "product_name")
        .agg(_money("price_cents").alias("total_sales"))
        .orderBy("store_name", "supplier_name", F.desc("product_name"))
    )


# --------------------------------------------------------------------------
# Q4 — seasonal product sales (SQL/OLAP Queries - Metro.sql:100-122;
# season CASE F9)
# --------------------------------------------------------------------------

def q04_seasonal_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _fact_products(spark, sf_dir)
        .groupBy("product_name", "season")
        .agg(_money().alias("total_sales"))
        .orderBy("product_name", "season")
    )


# --------------------------------------------------------------------------
# Q5 — store×supplier monthly revenue volatility
# (SQL/OLAP Queries - Metro.sql:127-175; previous-month CTE + LEFT JOIN
# J9 re-expressed as lag over (store, supplier) ordered by (year,
# month); IFNULL -> coalesce to 0 for the first month, F12)
# --------------------------------------------------------------------------

def q05_monthly_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        sales_fact(spark, sf_dir)
        .join(F.broadcast(store_dim(spark, sf_dir)), "store_id")
        .join(
            F.broadcast(
                supplier_dim(spark, sf_dir).select("supplier_id", "supplier_name")
            ),
            "supplier_id",
        )
        .groupBy("store_name", "supplier_name", "year", "month")
        .agg(F.sum("revenue_cents").alias("total_cents"))
    )
    w = Window.partitionBy("store_name", "supplier_name").orderBy("year", "month")
    return (
        monthly.withColumn("prev_cents", F.lag("total_cents").over(w))
        .select(
            "store_name",
            "supplier_name",
            "year",
            "month",
            (F.col("total_cents") / 100.0).alias("total_revenue"),
            F.coalesce(
                _pct_change_2dp("total_cents", "prev_cents"), F.lit(0.0)
            ).alias("revenue_volatility"),
        )
        .orderBy("store_name", "supplier_name", "year", "month")
    )


# --------------------------------------------------------------------------
# Q6 — market-basket product affinity, top-5 co-purchased pairs
# (SQL/OLAP Queries - Metro.sql:178-203; theta self-join J7)
# --------------------------------------------------------------------------

def q06_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = sales_fact(spark, sf_dir, time_attrs=False).select(
        "order_id", "product_id"
    )
    f1 = fact.alias("f1")
    f2 = fact.alias("f2")
    names = products_dim(spark, sf_dir).select("product_id", "product_name")
    pairs = f1.join(
        f2,
        (F.col("f1.order_id") == F.col("f2.order_id"))
        & (F.col("f1.product_id") < F.col("f2.product_id")),
    )
    return (
        pairs.join(
            F.broadcast(names.alias("p1")),
            F.col("f1.product_id") == F.col("p1.product_id"),
        )
        .join(
            F.broadcast(names.alias("p2")),
            F.col("f2.product_id") == F.col("p2.product_id"),
        )
        .groupBy(
            F.col("p1.product_name").alias("product_1"),
            F.col("p2.product_name").alias("product_2"),
        )
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), "product_1", "product_2")
        .limit(5)
    )


# --------------------------------------------------------------------------
# Q7 — yearly revenue ROLLUP by store, supplier, product
# (SQL/OLAP Queries - Metro.sql:207-228; A4. Spark rollup() emits the
# same NULL-marker subtotal rows as MySQL WITH ROLLUP.)
# --------------------------------------------------------------------------

def q07_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sales_fact(spark, sf_dir)
        .rollup("year", "store_id", "supplier_id", "product_id")
        .agg(_money().alias("total_revenue"))
        .orderBy(
            F.asc_nulls_first("year"),
            F.asc_nulls_first("store_id"),
            F.asc_nulls_first("supplier_id"),
            F.asc_nulls_first("product_id"),
        )
    )


# --------------------------------------------------------------------------
# Q8 — H1/H2 revenue & volume per product
# (SQL/OLAP Queries - Metro.sql:232-248; conditional aggregation A3.
# ``year`` added to the projection — declared deviation, the reference
# depends on disabling ONLY_FULL_GROUP_BY.)
# --------------------------------------------------------------------------

def q08_h1_h2_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.col("revenue_cents")
    qty = F.col("quantity_ordered")
    h1 = F.col("month") <= 6
    return (
        _fact_products(spark, sf_dir)
        .groupBy("product_name", "year")
        .agg(
            (F.sum(F.when(h1, cents).otherwise(0)) / 100.0).alias("h1_revenue"),
            F.sum(F.when(h1, qty).otherwise(0.0)).alias("h1_quantity"),
            (F.sum(F.when(~h1, cents).otherwise(0)) / 100.0).alias("h2_revenue"),
            F.sum(F.when(~h1, qty).otherwise(0.0)).alias("h2_quantity"),
            _money().alias("yearly_revenue"),
            F.sum(qty).alias("yearly_quantity"),
        )
        .orderBy("product_name", "year")
    )


# --------------------------------------------------------------------------
# Q9 — daily sales spikes vs running average
# (SQL/OLAP Queries - Metro.sql:251-269; windowed aggregate-of-aggregate
# W2: group to daily sales, then AVG over (PARTITION BY product ORDER BY
# date) with the default RANGE UNBOUNDED PRECEDING..CURRENT ROW frame —
# Spark/MySQL/DuckDB defaults all match.)
# --------------------------------------------------------------------------

def q09_daily_sales_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _fact_products(spark, sf_dir)
        .groupBy("product_id", "product_name", "order_date")
        .agg(F.sum("revenue_cents").alias("daily_cents"))
        .withColumn("daily_sales", F.col("daily_cents") / 100.0)
    )
    # Exact running average in integer cents with half-up integer
    # division — float division + round() is NOT cross-engine stable
    # (Spark rounds the shortest decimal repr, DuckDB rounds x*100).
    w = Window.partitionBy("product_id").orderBy("order_date")
    return (
        daily.withColumn("cum_cents", F.sum("daily_cents").over(w))
        .withColumn("cum_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "daily_avg_sales",
            F.expr("(2 * cum_cents + cum_n) div (2 * cum_n)") / 100.0,
        )
        .withColumn(
            "sales_status",
            F.when(
                F.col("daily_sales") > 2 * F.col("daily_avg_sales"),
                "High Revenue Spike (Outlier)",
            ).otherwise("Normal"),
        )
        .select(
            "product_name", "order_date", "daily_sales", "daily_avg_sales",
            "sales_status",
        )
        .orderBy("product_name", "order_date")
    )


# --------------------------------------------------------------------------
# Q10 — STORE_QUARTERLY_SALES view
# (SQL/OLAP Queries - Metro.sql:272-288; V1. ``store_quarterly_sales``
# also registers it as a temp view in the session catalog.)
# --------------------------------------------------------------------------

def q10_store_quarterly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        sales_fact(spark, sf_dir)
        .join(F.broadcast(store_dim(spark, sf_dir)), "store_id")
        .groupBy("store_id", "store_name", "quarter", "year")
        .agg(
            _money().alias("total_quarterly_revenue"),
            F.sum("quantity_ordered").alias("total_quarterly_quantity"),
        )
        .orderBy("store_name", "year", "quarter")
    )
    df.createOrReplaceTempView("store_quarterly_sales")
    return df


# --------------------------------------------------------------------------
# Flagship extra: TPC-H Q1-style pricing summary over lineitem — the
# canonical scan-heavy aggregate used by bench.py as the throughput
# headline (pure map-side-combinable hash agg; no joins).
# --------------------------------------------------------------------------

def q00_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measures are per-row rounded to cents (basis points for the
    discount) then summed as integers — exact, order-independent."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base_cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_price_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    charge_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100,
        0,
    ).cast("long")
    disc_bp = F.round(F.col("l_discount") * 10000, 0).cast("long")
    qty_long = F.col("l_quantity").cast("long")  # quantities are integral
    n = F.count(F.lit(1))
    # Averages via half-up integer division (see _pct_change_2dp note).
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        (F.sum(base_cents) / 100.0).alias("sum_base_price"),
        (F.sum(disc_price_cents) / 100.0).alias("sum_disc_price"),
        (F.sum(charge_cents) / 100.0).alias("sum_charge"),
        F.sum(qty_long).alias("_qty_total"),
        F.sum(base_cents).alias("_base_cents"),
        F.sum(disc_bp).alias("_disc_bp"),
        n.alias("count_order"),
    )
    return (
        agg.withColumn(
            "avg_qty",
            F.expr(
                "(2 * _qty_total * 100 + count_order) div (2 * count_order)"
            )
            / 100.0,
        )
        .withColumn(
            "avg_price",
            F.expr("(2 * _base_cents + count_order) div (2 * count_order)") / 100.0,
        )
        .withColumn(
            "avg_disc",
            F.expr("(2 * _disc_bp + count_order) div (2 * count_order)") / 10000.0,
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Extension queries beyond the reference's Q1-Q10: the two classic
# TPC-H shapes the star mapping supports directly — selective-dimension
# top-k (Q3 pattern) and the region-bound same-nation join (Q5
# pattern). Same integer-cents discipline as the rest of the suite.
# --------------------------------------------------------------------------

TPCH_SEGMENT = "BUILDING"
TPCH_DATE = "1996-03-15"
TPCH_REGION = "ASIA"


def q11_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 pattern: top-10 undelivered orders by revenue for one
    market segment (o_orderpriority stands in for the reference
    benchmark's o_shippriority, absent from this testdata)."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == TPCH_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") < F.lit(TPCH_DATE).cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit(TPCH_DATE).cast("date")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg((F.sum(cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "order_date", "order_id")
        .limit(10)
    )


def q12_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 pattern: per-nation revenue where the customer and the
    supplier share the nation, one region, one year."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == TPCH_REGION
    )
    local_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    supp = F.broadcast(
        spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.year("o_orderdate") == ANALYSIS_YEAR)
        .select("o_orderkey", "o_custkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(local_nations, supp.s_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# --------------------------------------------------------------------------
# Q13 — A5 as a LIVE uncorrelated scalar subquery. The reference's Q5
# computes its year bound at query time — `(SELECT MAX(Year) FROM
# TimeDimension)`, SQL/OLAP Queries - Metro.sql:140-141 — where the
# rest of this workload constant-folds ANALYSIS_YEAR (the other
# SURVEY-sanctioned A5 form). Here the engine executes the subquery:
# Catalyst plans it as a separate tiny aggregate, injects the result
# as a literal, and the year filter still pushes down to the scan.
# --------------------------------------------------------------------------

def q13_latest_year_store_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_star_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(s) */ store_id, store_name,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact f JOIN stores s USING (store_id)
        WHERE year = (SELECT MAX(year) FROM sales_fact)
        GROUP BY store_id, store_name
        ORDER BY total_revenue DESC, store_id
        """
    )


# --------------------------------------------------------------------------
# Q14-Q16 — extension patterns the reference lacks outright (SURVEY
# §2.12 lists semi/anti joins and ranking functions as absent): a
# correlated-EXISTS semi-join, a NOT-EXISTS anti-join, and a ranking
# window. They complete the join-type and window-function coverage of
# the Spark surface on the same TPC-H-ish tables.
# --------------------------------------------------------------------------

TPCH_EXISTS_YEAR = 1996


def q14_returned_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern (EXISTS -> LEFT SEMI join): orders placed in
    one year with at least one returned line item, counted per order
    priority. The semi-join keeps the orders scan at one row per match
    regardless of how many lines matched."""
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.year("o_orderdate") == TPCH_EXISTS_YEAR)
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_priority")
    )


def q15_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> LEFT ANTI join: per nation, customers who never
    placed an order, with their combined account balance (integer
    cents). The anti-join is the same set-at-a-time primitive the
    insert-if-absent sink uses (SURVEY §2.3 note)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    bal_cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(bal_cents) / 100.0).alias("acctbal_sum"),
        )
        .orderBy("nation")
    )


TOP_PARTS_PER_BRAND = 3


def q16_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (row_number per group): top-3 revenue parts
    within each brand. Pre-aggregation bounds the window input to one
    row per (brand, part); ties break on part id so the rank is
    total-ordered."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
        )
        .agg(F.sum(cents).alias("_rev_cents"))
    )
    w = Window.partitionBy("brand").orderBy(
        F.desc("_rev_cents"), F.asc("part_id")
    )
    return (
        per_part.withColumn("part_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("part_rank") <= TOP_PARTS_PER_BRAND)
        .select(
            "brand",
            "part_rank",
            "part_id",
            "part_name",
            (F.col("_rev_cents") / 100.0).alias("revenue"),
        )
        .orderBy("brand", "part_rank")
    )


def q17_week_probe_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bounded revenue probe served from the MANIFEST-BACKED
    fact store (plans.fact_store): order_date zone maps + range-
    clustered compaction prune the scan to the files whose date band
    intersects the probed week — file-level pruning WITHIN months,
    which the hive-partitioned/memoized fact paths cannot do. Results
    are hash-exact against the raw lineitem x orders join (the oracle
    computes the same aggregate without the store)."""
    import datetime as _dt

    from . import fact_store

    return fact_store.week_probe(
        spark,
        sf_dir,
        _dt.datetime(1996, 6, 1),
        _dt.datetime(1996, 6, 7),
    )


def q18_quarterly_serve_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORE_QUARTERLY_SALES answered from the INCREMENTALLY-MAINTAINED
    partial-sum table (operators.etl.refresh_quarterly_agg /
    quarterly_sales_serve) after a chunked streaming-style replay: the
    fact lands in three insert-if-absent commits (thirds by order id,
    line-grain key), each followed by a refresh that folds ONLY that
    snapshot's admitted rows into the maintained aggregate; the last
    chunk is then REPLAYED (fact insert no-ops into an empty snapshot,
    refresh folds nothing). Serving reads the small maintained table —
    never the fact (plan-guarded in tests) — and is hash-exact against
    the recomputed q10 oracle. This is the near-real-time serving twin
    of the reference's per-batch measure re-derivation
    (src/Meshjoin.java:705-753) + view recompute
    (SQL/OLAP Queries - Metro.sql:276-288)."""
    import shutil
    import tempfile

    from ..operators.etl import (
        quarterly_sales_serve,
        refresh_quarterly_agg,
    )
    from ..operators.sinks import make_sink

    fact = sales_fact(spark, sf_dir, line_no=True).select(
        "order_id",
        "line_no",
        "product_id",
        "supplier_id",
        "store_id",
        "quarter",
        "year",
        "quantity_ordered",
        "revenue_cents",
    )
    root = tempfile.mkdtemp(prefix="drv_q18_serve_")
    try:
        # the synthetic testdata's (orderkey, linenumber) is NOT unique
        # (real TPC-H's is), so the replay key widens to the 6-tuple
        # that IS — semantics unchanged: any unique line key works
        wh = make_sink(
            spark,
            root,
            keys={
                "sales_fact": [
                    "order_id",
                    "line_no",
                    "product_id",
                    "supplier_id",
                    "quantity_ordered",
                    "revenue_cents",
                ]
            },
            backend="manifest",
        )
        for b in range(3):
            wh.insert_if_absent(
                "sales_fact", fact.filter(F.col("order_id") % 3 == b)
            )
            refresh_quarterly_agg(wh)
        # at-least-once replay of the last chunk: empty fact snapshot,
        # refresh folds nothing, the serve answer is unchanged
        wh.insert_if_absent(
            "sales_fact", fact.filter(F.col("order_id") % 3 == 2)
        )
        refresh_quarterly_agg(wh)
        return quarterly_sales_serve(
            wh, store_dim(spark, sf_dir)
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# Shared constants for the maintained-serve rows: the replay chunking
# and the takedown key slices, used by BOTH the Spark builders and the
# generated oracle SQL so the two sides cannot drift.
SERVE_CHUNK_MOD = 3
TAKEDOWN_MOD = 7
TAKEDOWN_TOMBSTONE_RESIDUE = 0  # deleted via mode="tombstone"
TAKEDOWN_REWRITE_RESIDUE = 1    # deleted via mode="rewrite"

# The synthetic testdata's (orderkey, linenumber) is NOT unique (real
# TPC-H's is), so replay keys widen to a tuple that IS — semantics
# unchanged: any unique line key works.
LINEITEM_REPLAY_KEY = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
]


def _pricing_maintained(sink):
    """The q00 pricing summary as a ``MaintainedAggregate`` over a
    manifest-backed lineitem replica: groups (l_returnflag,
    l_linestatus); measures all integer (quantity as long, money in
    cents, discount in basis points) so partials cancel exactly;
    count_order is the aggregate's built-in ``n_rows``."""
    from ..operators.etl import MaintainedAggregate

    return MaintainedAggregate(
        sink,
        "lineitem_fact",
        "pricing_agg",
        group_by={
            "l_returnflag": lambda df: F.col("l_returnflag"),
            "l_linestatus": lambda df: F.col("l_linestatus"),
        },
        measures={
            "qty_long": lambda df: F.col("l_quantity").cast("long"),
            "base_cents": lambda df: F.round(
                F.col("l_extendedprice") * 100, 0
            ).cast("long"),
            "disc_price_cents": lambda df: F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            ).cast("long"),
            "charge_cents": lambda df: F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100,
                0,
            ).cast("long"),
            "disc_bp": lambda df: F.round(
                F.col("l_discount") * 10000, 0
            ).cast("long"),
        },
    )


def q19_pricing_summary_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The q00 pricing summary answered from a SECOND incrementally-
    maintained aggregate (operators.etl.MaintainedAggregate — the
    generalized machinery q18's quarterly serve runs on): lineitem
    lands in three insert-if-absent commits, each folded by a
    refresh; the last chunk replays (empty snapshot, refresh no-ops);
    the serve derives every q00 output column from the maintained
    integer partials — sums by division, averages by the same half-up
    integer division — and is hash-exact against the UNCHANGED q00
    oracle. The serve plan reads O(groups) partial rows, never
    lineitem (plan-guarded in tests/test_plan_quality.py)."""
    import shutil
    import tempfile

    from ..operators.sinks import make_sink

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        *LINEITEM_REPLAY_KEY, "l_returnflag", "l_linestatus",
        "l_discount", "l_tax",
    )
    root = tempfile.mkdtemp(prefix="drv_q19_serve_")
    try:
        sink = make_sink(
            spark,
            root,
            keys={"lineitem_fact": list(LINEITEM_REPLAY_KEY)},
            backend="manifest",
        )
        ma = _pricing_maintained(sink)
        for b in range(SERVE_CHUNK_MOD):
            sink.insert_if_absent(
                "lineitem_fact",
                li.filter(F.col("l_orderkey") % SERVE_CHUNK_MOD == b),
            )
            ma.refresh()
        # at-least-once replay: empty snapshot, refresh folds nothing
        sink.insert_if_absent(
            "lineitem_fact",
            li.filter(
                F.col("l_orderkey") % SERVE_CHUNK_MOD
                == SERVE_CHUNK_MOD - 1
            ),
        )
        ma.refresh()
        served = ma.serve()
        out = (
            served.withColumn(
                "avg_qty",
                F.expr(
                    "(2 * qty_long * 100 + n_rows) div (2 * n_rows)"
                )
                / 100.0,
            )
            .withColumn(
                "avg_price",
                F.expr("(2 * base_cents + n_rows) div (2 * n_rows)")
                / 100.0,
            )
            .withColumn(
                "avg_disc",
                F.expr("(2 * disc_bp + n_rows) div (2 * n_rows)")
                / 10000.0,
            )
            .select(
                "l_returnflag",
                "l_linestatus",
                F.col("qty_long").cast("double").alias("sum_qty"),
                (F.col("base_cents") / 100.0).alias("sum_base_price"),
                (F.col("disc_price_cents") / 100.0).alias(
                    "sum_disc_price"
                ),
                (F.col("charge_cents") / 100.0).alias("sum_charge"),
                "avg_qty",
                "avg_price",
                "avg_disc",
                F.col("n_rows").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q20_quarterly_serve_after_takedown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The round-13 composition row: STORE_QUARTERLY_SALES served from
    the maintained aggregate AFTER key-targeted takedowns in BOTH
    delete modes, hash-exact against the q10 oracle recomputed WITHOUT
    the deleted keys (the reference's MySQL view reflects DELETEs by
    construction, SQL/OLAP Queries - Metro.sql:276-288). Lifecycle:

    1. two fact chunks land, each folded by a refresh;
    2. the third chunk lands UNREFRESHED, then a TOMBSTONE takedown
       of the ``order_id % 7 == 0`` slice commits — the next refresh
       folds the new chunk's positives AND the takedown's negative
       partials (``deleted_between``) in one pass;
    3. a REWRITE takedown of the ``% 7 == 1`` slice redacts history —
       the next refresh detects it (``redactions_between``) and
       REBASES (truncate + refold);
    4. a materializing compaction consumes the tombstone — its
       redaction marker lands BELOW the fold horizon (the negatives
       were already folded), so the follow-up refresh is a no-op, not
       a rebase (serve-invariance of materialization);
    5. the tombstone takedown REPLAYS (matches nothing, commits
       nothing) and the serve answers from partials only.
    """
    import shutil
    import tempfile

    from ..operators.etl import (
        quarterly_sales_serve,
        refresh_quarterly_agg,
    )
    from ..operators.sinks import make_sink

    fact = sales_fact(spark, sf_dir, line_no=True).select(
        "order_id",
        "line_no",
        "product_id",
        "supplier_id",
        "store_id",
        "quarter",
        "year",
        "quantity_ordered",
        "revenue_cents",
    )
    root = tempfile.mkdtemp(prefix="drv_q20_serve_")
    try:
        wh = make_sink(
            spark,
            root,
            keys={
                "sales_fact": [
                    "order_id",
                    "line_no",
                    "product_id",
                    "supplier_id",
                    "quantity_ordered",
                    "revenue_cents",
                ]
            },
            backend="manifest",
        )
        for b in range(SERVE_CHUNK_MOD - 1):
            wh.insert_if_absent(
                "sales_fact",
                fact.filter(F.col("order_id") % SERVE_CHUNK_MOD == b),
            )
            refresh_quarterly_agg(wh)
        wh.insert_if_absent(
            "sales_fact",
            fact.filter(
                F.col("order_id") % SERVE_CHUNK_MOD
                == SERVE_CHUNK_MOD - 1
            ),
        )
        tomb_keys = fact.filter(
            F.col("order_id") % TAKEDOWN_MOD
            == TAKEDOWN_TOMBSTONE_RESIDUE
        ).select("order_id").distinct()
        assert (
            wh.delete_keys(
                "sales_fact", tomb_keys, on=["order_id"],
                mode="tombstone",
            )
            is not None
        )
        refresh_quarterly_agg(wh)  # positives + negatives, one fold
        rw_keys = fact.filter(
            F.col("order_id") % TAKEDOWN_MOD == TAKEDOWN_REWRITE_RESIDUE
        ).select("order_id").distinct()
        assert (
            wh.delete_keys(
                "sales_fact", rw_keys, on=["order_id"], mode="rewrite"
            )
            is not None
        )
        refresh_quarterly_agg(wh)  # redaction detected -> rebase
        wh.compact("sales_fact", materialize_deletes=True)
        assert refresh_quarterly_agg(wh) is None  # serve-invariant
        # replayed takedown: matches nothing, commits nothing
        assert (
            wh.delete_keys(
                "sales_fact", tomb_keys, on=["order_id"],
                mode="tombstone",
            )
            is None
        )
        assert refresh_quarterly_agg(wh) is None
        return quarterly_sales_serve(
            wh, store_dim(spark, sf_dir)
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# q21's deterministic ETL wiring, shared with its generated oracle:
# every product maps to store `p_partkey % STREAM_STORE_MOD`, and the
# stream carries the `l_orderkey % STREAM_SAMPLE_MOD == 0` line sample.
STREAM_STORE_MOD = 7
STREAM_SAMPLE_MOD = 5


def q21_stream_quarterly_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ST5's near-real-time serving story closed THROUGH THE REAL
    STREAMING ENTRY POINT: transactions derived from the testdata are
    written as CSV chunks, ``streaming.pipeline.stream_etl(
    maintain_quarterly_agg=True)`` drains them with an availableNow
    trigger one file per micro-batch — each foreachBatch runs the full
    MESHJOIN-equivalent load (typed parse, broadcast master joins,
    insert-if-absent) AND folds the admitted rows into the maintained
    quarterly aggregate — and the serve answers from the partial-sum
    table, hash-exact against recomputing the view from the source
    relations in SQL. Unlike q18 (which replays sink commits
    directly), every commit here goes through the checkpointed
    streaming query; the ETL's own measure derivation
    (round(quantity * price, 3), src/Meshjoin.java:724-725) is what
    the maintained mills partials fold.

    Determinism: order_id is an md5 over the unique lineitem 6-tuple
    (one fact row per line survives the first-occurrence dedup);
    products map to stores by ``p_partkey % STREAM_STORE_MOD``; the
    stream carries the ``l_orderkey % STREAM_SAMPLE_MOD == 0`` sample
    to bound the row's cost."""
    import shutil
    import tempfile

    from ..operators.etl import quarterly_sales_serve, warehouse_for
    from ..streaming.pipeline import stream_etl

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % STREAM_SAMPLE_MOD == 0
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    root = tempfile.mkdtemp(prefix="drv_q21_stream_")
    try:
        tx = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey"),
                    F.col("l_linenumber"),
                    F.col("l_partkey"),
                    F.col("l_suppkey"),
                    F.col("l_quantity").cast("int"),
                    F.round(F.col("l_extendedprice") * 100, 0).cast(
                        "long"
                    ),
                )
            ).alias("order_id"),
            F.date_format(
                "o_orderdate", "yyyy-MM-dd H:mm:ss"
            ).alias("order_date_raw"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("product_id"),
            F.col("l_quantity")
            .cast("int")
            .cast("string")
            .alias("quantity_ordered_raw"),
            F.concat(F.lit("C"), F.col("o_custkey")).alias("customer_id"),
            F.concat(F.lit("T"), F.col("l_orderkey")).alias("time_id"),
        )
        tx.repartition(4).write.option("header", "true").csv(
            f"{root}/tx"
        )
        products_master = part.select(
            F.concat(F.lit("P"), F.col("p_partkey")).alias("product_id"),
            F.col("p_name").alias("product_name"),
            F.col("p_retailprice").alias("price"),
            F.concat(
                F.lit("S"), F.col("p_partkey") % STREAM_STORE_MOD
            ).alias("supplier_id"),
            F.lit("sup").alias("supplier_name"),
            F.concat(
                F.lit("ST"), F.col("p_partkey") % STREAM_STORE_MOD
            ).alias("store_id"),
            F.concat(
                F.lit("Store "), F.col("p_partkey") % STREAM_STORE_MOD
            ).alias("store_name"),
        )
        customers_master = spark.read.parquet(
            f"{sf_dir}/customer.parquet"
        ).select(
            F.concat(F.lit("C"), F.col("c_custkey")).alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.lit("U").alias("gender"),
        )
        # 2 files per trigger = 2 micro-batches over the 4 CSV chunks:
        # still a multi-batch replay (cross-batch dedup + per-batch
        # refresh both exercised; the served aggregate is
        # batching-invariant — insert-if-absent admits each unique
        # line once and the refreshes fold the same rows, so the
        # result is hash-identical at any trigger size), at half the
        # fixed per-batch cost (plan + 4 sink commit round-trips per
        # trigger). Guide §6: fewer, larger micro-batches.
        q = stream_etl(
            spark,
            f"{root}/tx",
            f"{root}/wh",
            f"{root}/ckpt",
            products_master,
            customers_master,
            maintain_quarterly_agg=True,
            max_files_per_trigger=2,
        )
        q.awaitTermination()
        wh = warehouse_for(spark, f"{root}/wh", "manifest")
        return quarterly_sales_serve(
            wh, wh.read("store")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


OLAP_QUERIES = {
    "q00_pricing_summary": q00_pricing_summary,
    "q01_weekend_top_products": q01_weekend_top_products,
    "q01_weekday_top_products": q01_weekday_top_products,
    "q02_store_quarterly_growth": q02_store_quarterly_growth,
    "q03_supplier_contribution": q03_supplier_contribution,
    "q04_seasonal_sales": q04_seasonal_sales,
    "q05_monthly_volatility": q05_monthly_volatility,
    "q06_market_basket": q06_market_basket,
    "q07_rollup_revenue": q07_rollup_revenue,
    "q08_h1_h2_analysis": q08_h1_h2_analysis,
    "q09_daily_sales_outliers": q09_daily_sales_outliers,
    "q10_store_quarterly_sales": q10_store_quarterly_sales,
    "q11_shipping_priority": q11_shipping_priority,
    "q12_local_supplier_volume": q12_local_supplier_volume,
    "q13_latest_year_store_sales": q13_latest_year_store_sales,
    "q14_returned_orders_exists": q14_returned_orders_exists,
    "q15_customers_without_orders": q15_customers_without_orders,
    "q16_top_parts_per_brand": q16_top_parts_per_brand,
    "q17_week_probe_zonemap": q17_week_probe_zonemap,
    "q18_quarterly_serve_maintained": q18_quarterly_serve_maintained,
    "q19_pricing_summary_maintained": q19_pricing_summary_maintained,
    "q20_quarterly_serve_after_takedown": q20_quarterly_serve_after_takedown,
    "q21_stream_quarterly_serve": q21_stream_quarterly_serve,
}
