"""ANSI-SQL (DuckDB) oracles for every query in ``plans.queries``.

The driver registers the raw parquet tables as views (region nation
customer supplier part orders lineitem events documents embeddings) and
runs these strings side-by-side with the Spark builders; column names,
types and (rounded) values must match exactly.

The STAR_PRELUDE mirrors ``plans.star`` line for line: same join keys,
same revenue expression, same calendar derivations (DuckDB isodow 6/7
== Spark dayofweek 1/7 == SATURDAY/SUNDAY, src/Meshjoin.java:311-312).
"""

from __future__ import annotations

from .star import ANALYSIS_YEAR

STAR_PRELUDE = f"""
WITH sales_fact_base AS (
    SELECT
        l.l_orderkey              AS order_id,
        l.l_partkey               AS product_id,
        l.l_suppkey               AS supplier_id,
        s.s_nationkey             AS store_id,
        o.o_custkey               AS customer_id,
        l.l_quantity              AS quantity_ordered,
        CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                                  AS revenue_cents,
        o.o_orderdate             AS order_date
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
sales_fact AS (
    SELECT *,
        revenue_cents / 100.0              AS total_revenue,
        CAST(year(order_date) AS INT)      AS year,
        CAST(month(order_date) AS INT)     AS month,
        CAST(day(order_date) AS INT)       AS day,
        CAST(weekofyear(order_date) AS INT) AS week,
        CAST(quarter(order_date) AS INT)   AS quarter,
        upper(strftime(order_date, '%A'))  AS day_name,
        isodow(order_date) IN (6, 7)       AS is_weekend,
        CASE
            WHEN month(order_date) IN (3, 4, 5)  THEN 'Spring'
            WHEN month(order_date) IN (6, 7, 8)  THEN 'Summer'
            WHEN month(order_date) IN (9, 10, 11) THEN 'Fall'
            WHEN month(order_date) IN (12, 1, 2) THEN 'Winter'
        END AS season
    FROM sales_fact_base
),
products AS (
    SELECT p_partkey AS product_id, p_name AS product_name,
           p_retailprice AS price,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
           p_brand AS brand, p_type AS product_type
    FROM part
),
suppliers AS (
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           s_nationkey AS store_id
    FROM supplier
),
stores AS (
    SELECT n_nationkey AS store_id, n_name AS store_name FROM nation
),
customers_dim AS (
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_mktsegment AS segment
    FROM customer
)
"""


def _sql_pct_change(cur: str, prev: str) -> str:
    """DuckDB twin of plans.queries._pct_change_2dp: half-up integer
    percent change, NULL when prev = 0 (guarded — DuckDB ``//`` raises
    on zero divisors where Spark ``div`` returns NULL)."""
    return (
        f"(CASE WHEN {prev} = 0 THEN NULL\n"
        f"       ELSE (CASE WHEN {cur} >= {prev} THEN 1 ELSE -1 END\n"
        f"        * ((2 * abs({cur} - {prev}) * 10000 + {prev})\n"
        f"           // (2 * {prev}))) END) / 100.0"
    )


def _q01(weekend: str) -> str:
    return f"""{STAR_PRELUDE}
SELECT f.month, p.product_name,
       SUM(f.revenue_cents) / 100.0 AS total_revenue
FROM sales_fact f
JOIN products p ON f.product_id = p.product_id
WHERE f.is_weekend = {weekend} AND f.year = {ANALYSIS_YEAR}
GROUP BY f.month, p.product_name
ORDER BY total_revenue DESC, f.month ASC, p.product_name ASC
LIMIT 5
"""


Q02 = f"""{STAR_PRELUDE}
, revenue AS (
    SELECT f.store_id, st.store_name, f.quarter,
           SUM(f.revenue_cents) AS total_cents
    FROM sales_fact f
    JOIN stores st ON f.store_id = st.store_id
    WHERE f.year = {ANALYSIS_YEAR}
    GROUP BY f.store_id, st.store_name, f.quarter
),
lagged AS (
    SELECT *, LAG(total_cents) OVER (
        PARTITION BY store_id ORDER BY quarter
    ) AS prev_cents
    FROM revenue
)
SELECT store_id, store_name, quarter,
       total_cents / 100.0 AS total_revenue,
       prev_cents / 100.0 AS previous_quarter_revenue,
       {_sql_pct_change("total_cents", "prev_cents")} AS revenue_growth_rate
FROM lagged
WHERE prev_cents IS NOT NULL
"""

Q03 = f"""{STAR_PRELUDE}
SELECT st.store_name, sp.supplier_name, p.product_name,
       SUM(p.price_cents) / 100.0 AS total_sales
FROM sales_fact f
JOIN stores st ON f.store_id = st.store_id
JOIN products p ON f.product_id = p.product_id
JOIN suppliers sp ON f.supplier_id = sp.supplier_id
GROUP BY st.store_name, sp.supplier_name, p.product_name
"""

Q04 = f"""{STAR_PRELUDE}
SELECT p.product_name, f.season,
       SUM(f.revenue_cents) / 100.0 AS total_sales
FROM sales_fact f
JOIN products p ON f.product_id = p.product_id
GROUP BY p.product_name, f.season
"""

Q05 = f"""{STAR_PRELUDE}
, monthly AS (
    SELECT st.store_name, sp.supplier_name, f.year, f.month,
           SUM(f.revenue_cents) AS total_cents
    FROM sales_fact f
    JOIN stores st ON f.store_id = st.store_id
    JOIN suppliers sp ON f.supplier_id = sp.supplier_id
    GROUP BY st.store_name, sp.supplier_name, f.year, f.month
),
lagged AS (
    SELECT *, LAG(total_cents) OVER (
        PARTITION BY store_name, supplier_name ORDER BY year, month
    ) AS prev_cents
    FROM monthly
)
SELECT store_name, supplier_name, year, month,
       total_cents / 100.0 AS total_revenue,
       COALESCE(
           {_sql_pct_change("total_cents", "prev_cents")},
           0.0) AS revenue_volatility
FROM lagged
"""

Q06 = f"""{STAR_PRELUDE}
SELECT p1.product_name AS product_1, p2.product_name AS product_2,
       COUNT(*) AS frequency
FROM sales_fact f1
JOIN sales_fact f2
  ON f1.order_id = f2.order_id AND f1.product_id < f2.product_id
JOIN products p1 ON f1.product_id = p1.product_id
JOIN products p2 ON f2.product_id = p2.product_id
GROUP BY p1.product_name, p2.product_name
ORDER BY frequency DESC, product_1 ASC, product_2 ASC
LIMIT 5
"""

Q07 = f"""{STAR_PRELUDE}
SELECT year, store_id, supplier_id, product_id,
       SUM(revenue_cents) / 100.0 AS total_revenue
FROM sales_fact
GROUP BY ROLLUP (year, store_id, supplier_id, product_id)
"""

Q08 = f"""{STAR_PRELUDE}
SELECT p.product_name, f.year,
       SUM(CASE WHEN f.month <= 6 THEN f.revenue_cents ELSE 0 END) / 100.0 AS h1_revenue,
       SUM(CASE WHEN f.month <= 6 THEN f.quantity_ordered ELSE 0.0 END) AS h1_quantity,
       SUM(CASE WHEN f.month > 6 THEN f.revenue_cents ELSE 0 END) / 100.0 AS h2_revenue,
       SUM(CASE WHEN f.month > 6 THEN f.quantity_ordered ELSE 0.0 END) AS h2_quantity,
       SUM(f.revenue_cents) / 100.0 AS yearly_revenue,
       SUM(f.quantity_ordered) AS yearly_quantity
FROM sales_fact f
JOIN products p ON f.product_id = p.product_id
GROUP BY p.product_name, f.year
"""

Q09 = f"""{STAR_PRELUDE}
, daily AS (
    SELECT f.product_id, p.product_name, f.order_date,
           SUM(f.revenue_cents) AS daily_cents,
           SUM(f.revenue_cents) / 100.0 AS daily_sales
    FROM sales_fact f
    JOIN products p ON f.product_id = p.product_id
    GROUP BY f.product_id, p.product_name, f.order_date
),
windowed AS (
    -- half-up integer-cents running average, same math as the Spark
    -- builder: (2*S + n) // (2*n) / 100.0
    SELECT product_name, order_date, daily_sales,
           ((2 * SUM(daily_cents) OVER w + COUNT(*) OVER w)
            // (2 * COUNT(*) OVER w)) / 100.0 AS daily_avg_sales
    FROM daily
    WINDOW w AS (PARTITION BY product_id ORDER BY order_date)
)
SELECT product_name, order_date, daily_sales, daily_avg_sales,
       CASE WHEN daily_sales > 2 * daily_avg_sales
            THEN 'High Revenue Spike (Outlier)'
            ELSE 'Normal'
       END AS sales_status
FROM windowed
"""

Q10 = f"""{STAR_PRELUDE}
SELECT f.store_id, st.store_name, f.quarter, f.year,
       SUM(f.revenue_cents) / 100.0 AS total_quarterly_revenue,
       SUM(f.quantity_ordered) AS total_quarterly_quantity
FROM sales_fact f
JOIN stores st ON f.store_id = st.store_id
GROUP BY f.store_id, st.store_name, f.quarter, f.year
"""

# q20's oracle: the q10 view recomputed WITHOUT the taken-down key
# slices — generated from the SAME constants the Spark lifecycle uses
# (plans.queries.TAKEDOWN_*), so the two sides cannot drift. A MySQL
# deployment of the reference gets this for free: DELETE + the view
# re-query (SQL/OLAP Queries - Metro.sql:276-288).
def _q10_after_takedown() -> str:
    from .queries import (
        TAKEDOWN_MOD,
        TAKEDOWN_REWRITE_RESIDUE,
        TAKEDOWN_TOMBSTONE_RESIDUE,
    )

    return f"""{STAR_PRELUDE}
SELECT f.store_id, st.store_name, f.quarter, f.year,
       SUM(f.revenue_cents) / 100.0 AS total_quarterly_revenue,
       SUM(f.quantity_ordered) AS total_quarterly_quantity
FROM sales_fact f
JOIN stores st ON f.store_id = st.store_id
WHERE f.order_id % {TAKEDOWN_MOD}
      NOT IN ({TAKEDOWN_TOMBSTONE_RESIDUE}, {TAKEDOWN_REWRITE_RESIDUE})
GROUP BY f.store_id, st.store_name, f.quarter, f.year
"""


Q10_AFTER_TAKEDOWN = _q10_after_takedown()

# q21's oracle: the quarterly view recomputed from the SOURCE
# relations with the streaming ETL's exact derivations — the sampled
# line set, the p_partkey-modulo store mapping, the reference's
# round(quantity * price, 3) revenue (src/Meshjoin.java:724-725), and
# the maintained aggregate's integer-mills fold. Generated from the
# same constants the Spark lifecycle uses (plans.queries.STREAM_*).
def _q21_stream_serve() -> str:
    from .queries import STREAM_SAMPLE_MOD, STREAM_STORE_MOD

    return f"""
WITH fact AS (
    SELECT
        l.l_partkey % {STREAM_STORE_MOD}       AS st,
        CAST(quarter(o.o_orderdate) AS INT)    AS quarter,
        CAST(year(o.o_orderdate) AS INT)       AS year,
        CAST(l.l_quantity AS INT)              AS qty,
        CAST(ROUND(ROUND(CAST(l.l_quantity AS INT) * p.p_retailprice, 3)
                   * 1000, 0) AS BIGINT)       AS mills
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_orderkey % {STREAM_SAMPLE_MOD} = 0
)
SELECT 'ST' || st                              AS store_id,
       'Store ' || st                          AS store_name,
       quarter,
       year,
       SUM(mills) / 1000.0                     AS total_quarterly_revenue,
       CAST(SUM(qty) AS BIGINT)                AS total_quarterly_quantity
FROM fact
GROUP BY st, quarter, year
"""


Q21_STREAM_SERVE = _q21_stream_serve()

Q00 = """
WITH li AS (
    SELECT l_returnflag, l_linestatus, l_quantity,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS base_cents,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS disc_price_cents,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT) AS charge_cents,
           CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS disc_bp
    FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(base_cents) / 100.0 AS sum_base_price,
       SUM(disc_price_cents) / 100.0 AS sum_disc_price,
       SUM(charge_cents) / 100.0 AS sum_charge,
       ((2 * SUM(CAST(l_quantity AS BIGINT)) * 100 + COUNT(*))
        // (2 * COUNT(*))) / 100.0 AS avg_qty,
       ((2 * SUM(base_cents) + COUNT(*)) // (2 * COUNT(*))) / 100.0 AS avg_price,
       ((2 * SUM(disc_bp) + COUNT(*)) // (2 * COUNT(*))) / 10000.0 AS avg_disc,
       COUNT(*) AS count_order
FROM li
GROUP BY l_returnflag, l_linestatus
"""

Q11 = """
SELECT l.l_orderkey AS order_id,
       o.o_orderdate AS order_date,
       o.o_orderpriority AS order_priority,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT))
           / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1996-03-15'
  AND l.l_shipdate > DATE '1996-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, order_date, order_id
LIMIT 10
"""

Q12 = f"""
SELECT n.n_name AS nation,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT))
           / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = {ANALYSIS_YEAR}
GROUP BY 1
ORDER BY revenue DESC, nation
"""

# Q13: the scalar subquery runs live on the DuckDB side too — both
# engines compute the year bound at query time.
Q13 = f"""{STAR_PRELUDE}
SELECT store_id, store_name,
       SUM(revenue_cents) / 100.0 AS total_revenue
FROM sales_fact f JOIN stores s USING (store_id)
WHERE year = (SELECT MAX(year) FROM sales_fact)
GROUP BY store_id, store_name
ORDER BY total_revenue DESC, store_id
"""


# Q14-Q16 extension patterns: the oracle states the declarative
# EXISTS / NOT EXISTS / window form; Spark executes semi/anti joins
# and a pre-aggregated ranking window.
Q14 = """
SELECT o.o_orderpriority AS order_priority, count(*) AS n_orders
FROM orders o
WHERE year(o.o_orderdate) = 1996
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1
ORDER BY order_priority
"""

Q15 = """
SELECT n.n_name AS nation, count(*) AS n_customers,
       SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) / 100.0 AS acctbal_sum
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
ORDER BY nation
"""

Q16 = """
WITH per_part AS (
    SELECT p.p_brand AS brand, p.p_partkey AS part_id, p.p_name AS part_name,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                    AS BIGINT)) AS rev_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2, 3
)
SELECT brand, CAST(rk AS INT) AS part_rank, part_id, part_name,
       rev_cents / 100.0 AS revenue
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY brand ORDER BY rev_cents DESC, part_id
    ) AS rk
    FROM per_part
)
WHERE rk <= 3
ORDER BY brand, part_rank
"""


Q17 = """
SELECT o.o_orderdate AS order_date,
       COUNT(*) AS n_lines,
       CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
           AS BIGINT)) / 100.0 AS total_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-06-01 00:00:00'
                        AND TIMESTAMP '1996-06-07 00:00:00'
GROUP BY o.o_orderdate
ORDER BY order_date
"""


OLAP_ORACLES = {
    "q13_latest_year_store_sales": Q13,
    "q14_returned_orders_exists": Q14,
    "q15_customers_without_orders": Q15,
    "q16_top_parts_per_brand": Q16,
    "q17_week_probe_zonemap": Q17,
    "q00_pricing_summary": Q00,
    "q11_shipping_priority": Q11,
    "q12_local_supplier_volume": Q12,
    "q01_weekend_top_products": _q01("TRUE"),
    "q01_weekday_top_products": _q01("FALSE"),
    "q02_store_quarterly_growth": Q02,
    "q03_supplier_contribution": Q03,
    "q04_seasonal_sales": Q04,
    "q05_monthly_volatility": Q05,
    "q06_market_basket": Q06,
    "q07_rollup_revenue": Q07,
    "q08_h1_h2_analysis": Q08,
    "q09_daily_sales_outliers": Q09,
    "q10_store_quarterly_sales": Q10,
    # the maintained-aggregate serve paths must answer EXACTLY the
    # recomputed views — same oracles as q10/q00 by construction
    "q18_quarterly_serve_maintained": Q10,
    "q19_pricing_summary_maintained": Q00,
    "q20_quarterly_serve_after_takedown": Q10_AFTER_TAKEDOWN,
    "q21_stream_quarterly_serve": Q21_STREAM_SERVE,
}
