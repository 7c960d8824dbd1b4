"""The OLAP workload as Spark SQL strings — the second surface of the
query layer (SURVEY §7 step 4: every query exists as BOTH a DataFrame
builder in ``plans.queries`` and a ``spark.sql`` string here, proving
the engine serves users who bring SQL text, like the reference's
``SQL/OLAP Queries - Metro.sql``).

The strings run against the views registered by
``plans.star.register_star_views`` (+ the raw testdata views for the
lineitem pricing summary) and reproduce the DataFrame builders'
results exactly: same integer-cents money math, same half-up integer
division for ratios, same tie-broken ORDER BY ... LIMIT — see the
determinism notes in ``plans.queries``. ``tests/test_sql_queries.py``
asserts SQL ≡ DataFrame per query.

Broadcast behavior: the DataFrame side marks dimensions with
``F.broadcast``; here the ``/*+ BROADCAST(alias) */`` hint states the
same physical intent in SQL.
"""

from __future__ import annotations

from .star import ANALYSIS_YEAR

# Shared fragment: exact half-up percent change at 2 dp in integer
# math (see plans.queries._pct_change_2dp). prev = 0 is defined as
# NULL on every surface (Spark div would return NULL, DuckDB // would
# raise — the guard pins one semantic).
def _pct(cur: str, prev: str) -> str:
    return (
        f"(if({prev} = 0, cast(null as bigint), if({cur} >= {prev}, 1, -1) * "
        f"((2 * abs({cur} - {prev}) * 10000 + {prev}) div (2 * {prev})))) / 100.0D"
    )


SQL_QUERIES: dict[str, str] = {
    "q01_weekend_top_products": f"""
        SELECT /*+ BROADCAST(p) */ month, product_name,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact f JOIN products p USING (product_id)
        WHERE is_weekend = true AND year = {ANALYSIS_YEAR}
        GROUP BY month, product_name
        ORDER BY total_revenue DESC, month ASC, product_name ASC
        LIMIT 5
    """,
    "q01_weekday_top_products": f"""
        SELECT /*+ BROADCAST(p) */ month, product_name,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact f JOIN products p USING (product_id)
        WHERE is_weekend = false AND year = {ANALYSIS_YEAR}
        GROUP BY month, product_name
        ORDER BY total_revenue DESC, month ASC, product_name ASC
        LIMIT 5
    """,
    "q02_store_quarterly_growth": f"""
        WITH revenue AS (
            SELECT /*+ BROADCAST(s) */ store_id, store_name, quarter,
                   SUM(revenue_cents) AS total_cents
            FROM sales_fact f JOIN stores s USING (store_id)
            WHERE year = {ANALYSIS_YEAR}
            GROUP BY store_id, store_name, quarter
        ),
        w AS (
            SELECT *, LAG(total_cents) OVER (
                       PARTITION BY store_id ORDER BY quarter) AS prev_cents
            FROM revenue
        )
        SELECT store_id, store_name, quarter,
               total_cents / 100.0D AS total_revenue,
               prev_cents / 100.0D AS previous_quarter_revenue,
               {_pct("total_cents", "prev_cents")} AS revenue_growth_rate
        FROM w WHERE prev_cents IS NOT NULL
        ORDER BY store_id, quarter
    """,
    "q03_supplier_contribution": """
        SELECT /*+ BROADCAST(st, p, sp) */ store_name, supplier_name,
               product_name, SUM(price_cents) / 100.0D AS total_sales
        FROM sales_fact f
        JOIN stores st USING (store_id)
        JOIN products p USING (product_id)
        JOIN suppliers sp USING (supplier_id)
        GROUP BY store_name, supplier_name, product_name
        ORDER BY store_name, supplier_name, product_name DESC
    """,
    "q04_seasonal_sales": """
        SELECT /*+ BROADCAST(p) */ product_name, season,
               SUM(revenue_cents) / 100.0D AS total_sales
        FROM sales_fact f JOIN products p USING (product_id)
        GROUP BY product_name, season
        ORDER BY product_name, season
    """,
    "q05_monthly_volatility": f"""
        WITH monthly AS (
            SELECT /*+ BROADCAST(st, sp) */ store_name, supplier_name,
                   year, month, SUM(revenue_cents) AS total_cents
            FROM sales_fact f
            JOIN stores st USING (store_id)
            JOIN suppliers sp USING (supplier_id)
            GROUP BY store_name, supplier_name, year, month
        ),
        w AS (
            SELECT *, LAG(total_cents) OVER (
                       PARTITION BY store_name, supplier_name
                       ORDER BY year, month) AS prev_cents
            FROM monthly
        )
        SELECT store_name, supplier_name, year, month,
               total_cents / 100.0D AS total_revenue,
               coalesce({_pct("total_cents", "prev_cents")}, 0.0D)
                   AS revenue_volatility
        FROM w
        ORDER BY store_name, supplier_name, year, month
    """,
    "q06_market_basket": """
        SELECT /*+ BROADCAST(p1, p2) */ p1.product_name AS product_1,
               p2.product_name AS product_2, COUNT(*) AS frequency
        FROM sales_fact f1
        JOIN sales_fact f2
          ON f1.order_id = f2.order_id AND f1.product_id < f2.product_id
        JOIN products p1 ON f1.product_id = p1.product_id
        JOIN products p2 ON f2.product_id = p2.product_id
        GROUP BY p1.product_name, p2.product_name
        ORDER BY frequency DESC, product_1, product_2
        LIMIT 5
    """,
    "q07_rollup_revenue": """
        SELECT year, store_id, supplier_id, product_id,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact
        GROUP BY ROLLUP (year, store_id, supplier_id, product_id)
        ORDER BY year ASC NULLS FIRST, store_id ASC NULLS FIRST,
                 supplier_id ASC NULLS FIRST, product_id ASC NULLS FIRST
    """,
    "q08_h1_h2_analysis": """
        SELECT /*+ BROADCAST(p) */ product_name, year,
               SUM(CASE WHEN month <= 6 THEN revenue_cents ELSE 0 END) / 100.0D
                   AS h1_revenue,
               SUM(CASE WHEN month <= 6 THEN quantity_ordered ELSE 0.0D END)
                   AS h1_quantity,
               SUM(CASE WHEN month > 6 THEN revenue_cents ELSE 0 END) / 100.0D
                   AS h2_revenue,
               SUM(CASE WHEN month > 6 THEN quantity_ordered ELSE 0.0D END)
                   AS h2_quantity,
               SUM(revenue_cents) / 100.0D AS yearly_revenue,
               SUM(quantity_ordered) AS yearly_quantity
        FROM sales_fact f JOIN products p USING (product_id)
        GROUP BY product_name, year
        ORDER BY product_name, year
    """,
    "q09_daily_sales_outliers": """
        WITH daily AS (
            SELECT /*+ BROADCAST(p) */ product_id, product_name, order_date,
                   SUM(revenue_cents) AS daily_cents
            FROM sales_fact f JOIN products p USING (product_id)
            GROUP BY product_id, product_name, order_date
        ),
        runsum AS (
            SELECT *,
                   SUM(daily_cents) OVER w AS cum_cents,
                   COUNT(*) OVER w AS cum_n
            FROM daily
            WINDOW w AS (PARTITION BY product_id ORDER BY order_date)
        )
        SELECT product_name, order_date,
               daily_cents / 100.0D AS daily_sales,
               ((2 * cum_cents + cum_n) div (2 * cum_n)) / 100.0D
                   AS daily_avg_sales,
               CASE WHEN daily_cents / 100.0D >
                         2 * (((2 * cum_cents + cum_n) div (2 * cum_n)) / 100.0D)
                    THEN 'High Revenue Spike (Outlier)' ELSE 'Normal'
               END AS sales_status
        FROM runsum
        ORDER BY product_name, order_date
    """,
    "q10_store_quarterly_sales": """
        SELECT /*+ BROADCAST(s) */ store_id, store_name, quarter, year,
               SUM(revenue_cents) / 100.0D AS total_quarterly_revenue,
               SUM(quantity_ordered) AS total_quarterly_quantity
        FROM sales_fact f JOIN stores s USING (store_id)
        GROUP BY store_id, store_name, quarter, year
        ORDER BY store_name, year, quarter
    """,
    "q11_shipping_priority": """
        SELECT l.l_orderkey AS order_id,
               o.o_orderdate AS order_date,
               o.o_orderpriority AS order_priority,
               SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                        AS BIGINT)) / 100.0D AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1996-03-15'
          AND l.l_shipdate > DATE '1996-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, order_date, order_id
        LIMIT 10
    """,
    "q12_local_supplier_volume": f"""
        SELECT n.n_name AS nation,
               SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                        AS BIGINT)) / 100.0D AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = {ANALYSIS_YEAR}
        GROUP BY 1
        ORDER BY revenue DESC, nation
    """,
    # TPC-H Q1-style pricing summary over the raw lineitem view.
    "q00_pricing_summary": """
        WITH base AS (
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS base_cents,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT) AS disc_price_cents,
                   CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              * 100, 0) AS BIGINT) AS charge_cents,
                   CAST(round(l_discount * 10000, 0) AS BIGINT) AS disc_bp,
                   CAST(l_quantity AS BIGINT) AS qty_long
            FROM lineitem
        )
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(base_cents) / 100.0D AS sum_base_price,
               SUM(disc_price_cents) / 100.0D AS sum_disc_price,
               SUM(charge_cents) / 100.0D AS sum_charge,
               ((2 * SUM(qty_long) * 100 + COUNT(*)) div (2 * COUNT(*))) / 100.0D
                   AS avg_qty,
               ((2 * SUM(base_cents) + COUNT(*)) div (2 * COUNT(*))) / 100.0D
                   AS avg_price,
               ((2 * SUM(disc_bp) + COUNT(*)) div (2 * COUNT(*))) / 10000.0D
                   AS avg_disc,
               COUNT(*) AS count_order
        FROM base
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # A5 live: the year bound is an uncorrelated scalar subquery the
    # engine executes at query time (reference Q5,
    # SQL/OLAP Queries - Metro.sql:140-141) — not a folded constant.
    "q13_latest_year_store_sales": """
        SELECT /*+ BROADCAST(s) */ store_id, store_name,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact f JOIN stores s USING (store_id)
        WHERE year = (SELECT MAX(year) FROM sales_fact)
        GROUP BY store_id, store_name
        ORDER BY total_revenue DESC, store_id
    """,
    # Q14-Q16: Spark SQL's own correlated EXISTS / NOT EXISTS (planned
    # as semi/anti joins) and ranking window — the declarative twins of
    # the q14-q16 DataFrame builders.
    "q14_returned_orders_exists": """
        SELECT o.o_orderpriority AS order_priority, count(*) AS n_orders
        FROM orders o
        WHERE year(o.o_orderdate) = 1996
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY 1
        ORDER BY order_priority
    """,
    "q15_customers_without_orders": """
        SELECT /*+ BROADCAST(n) */ n.n_name AS nation,
               count(*) AS n_customers,
               SUM(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) / 100.0D
                   AS acctbal_sum
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
        ORDER BY nation
    """,
    "q16_top_parts_per_brand": """
        WITH per_part AS (
            SELECT /*+ BROADCAST(p) */ p.p_brand AS brand,
                   p.p_partkey AS part_id, p.p_name AS part_name,
                   SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100,
                                  0) AS BIGINT)) AS rev_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2, 3
        )
        SELECT brand, CAST(rk AS INT) AS part_rank, part_id, part_name,
               rev_cents / 100.0D AS revenue
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY brand ORDER BY rev_cents DESC, part_id
            ) AS rk
            FROM per_part
        )
        WHERE rk <= 3
        ORDER BY brand, part_rank
    """,
    # q17's DataFrame surface reads the manifest-backed zone-map fact
    # store (plans.fact_store — the access-path optimization under
    # test); this SQL twin computes the SAME aggregate from the
    # registered sales_fact view, asserting the store-served answer
    # equals the view-derived one.
    "q17_week_probe_zonemap": """
        SELECT order_date,
               COUNT(*) AS n_lines,
               CAST(SUM(quantity_ordered) AS BIGINT) AS total_qty,
               SUM(revenue_cents) / 100.0D AS total_revenue
        FROM sales_fact
        WHERE order_date BETWEEN TIMESTAMP '1996-06-01 00:00:00'
                             AND TIMESTAMP '1996-06-07 00:00:00'
        GROUP BY order_date
        ORDER BY order_date
    """,
    # q18's DataFrame surface serves STORE_QUARTERLY_SALES from the
    # incrementally-maintained partial-sum table (operators.etl.
    # refresh_quarterly_agg — the access path under test); this SQL
    # twin recomputes the SAME view from the registered sales_fact,
    # asserting the maintained answer equals the recomputed one
    # (identical to q10's text by construction — the serve path is an
    # access-path optimization, never a semantic change).
    "q18_quarterly_serve_maintained": """
        SELECT /*+ BROADCAST(s) */ store_id, store_name, quarter, year,
               SUM(revenue_cents) / 100.0D AS total_quarterly_revenue,
               SUM(quantity_ordered) AS total_quarterly_quantity
        FROM sales_fact f JOIN stores s USING (store_id)
        GROUP BY store_id, store_name, quarter, year
        ORDER BY store_name, year, quarter
    """,
}


def _lifecycle_twins() -> dict[str, str]:
    """SQL twins for the r13 maintained-serve lifecycle rows. Like
    q17/q18, the DataFrame surface under test is an ACCESS PATH
    (chunked replay + refreshes + takedowns + the partial-sum serve);
    the twin recomputes the same answer declaratively from the
    registered views, generated from the SAME constants the Spark
    lifecycle uses (plans.queries.TAKEDOWN_* / STREAM_*), so the two
    sides cannot drift."""
    from .queries import (
        STREAM_SAMPLE_MOD,
        STREAM_STORE_MOD,
        TAKEDOWN_MOD,
        TAKEDOWN_REWRITE_RESIDUE,
        TAKEDOWN_TOMBSTONE_RESIDUE,
    )

    return {
        # q19 serves the q00 pricing summary from maintained integer
        # partials after a chunked replay (+ one replayed no-op chunk)
        # — the answer IS the q00 summary; the twin is its text.
        "q19_pricing_summary_maintained": SQL_QUERIES[
            "q00_pricing_summary"
        ],
        # q20 = q10 recomputed WITHOUT the taken-down key slices
        # (tombstone residue + rewrite residue), mirroring the oracle
        # (plans.oracles.Q10_AFTER_TAKEDOWN).
        "q20_quarterly_serve_after_takedown": f"""
        SELECT /*+ BROADCAST(s) */ store_id, store_name, quarter, year,
               SUM(revenue_cents) / 100.0D AS total_quarterly_revenue,
               SUM(quantity_ordered) AS total_quarterly_quantity
        FROM sales_fact f JOIN stores s USING (store_id)
        WHERE order_id % {TAKEDOWN_MOD}
              NOT IN ({TAKEDOWN_TOMBSTONE_RESIDUE},
                      {TAKEDOWN_REWRITE_RESIDUE})
        GROUP BY store_id, store_name, quarter, year
        ORDER BY store_name, year, quarter
    """,
        # q21 = the quarterly view recomputed from the SOURCE
        # relations with the streaming ETL's exact derivations: the
        # sampled line set, the p_partkey-modulo store mapping, the
        # reference's round(quantity * price, 3) revenue folded as
        # integer mills (plans.oracles.Q21_STREAM_SERVE).
        "q21_stream_quarterly_serve": f"""
        WITH fact AS (
            SELECT l.l_partkey % {STREAM_STORE_MOD}    AS st,
                   CAST(quarter(o.o_orderdate) AS INT) AS quarter,
                   CAST(year(o.o_orderdate) AS INT)    AS year,
                   CAST(l.l_quantity AS INT)           AS qty,
                   CAST(round(round(CAST(l.l_quantity AS INT)
                                    * p.p_retailprice, 3) * 1000, 0)
                        AS BIGINT)                     AS mills
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_orderkey % {STREAM_SAMPLE_MOD} = 0
        )
        SELECT concat('ST', CAST(st AS STRING))        AS store_id,
               concat('Store ', CAST(st AS STRING))    AS store_name,
               quarter,
               year,
               SUM(mills) / 1000.0D AS total_quarterly_revenue,
               SUM(qty)             AS total_quarterly_quantity
        FROM fact
        GROUP BY st, quarter, year
        ORDER BY store_name, year, quarter
    """,
    }


SQL_QUERIES.update(_lifecycle_twins())
