"""Durable catalog (V1/V2 parity): tables + the STORE_QUARTERLY_SALES
view published by one session must resolve BY NAME in a completely
separate later session pointed at the same catalog dir — the Spark
twin of the reference's MySQL catalog durability
(SQL/Star_Schema_Metro.sql; SQL/OLAP Queries - Metro.sql:276-288).

Each session runs in its own subprocess (own JVM): Derby permits one
JVM at a time, and a fresh process is the honest durability check.
"""

from __future__ import annotations

import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

PUBLISH = """
import sys; sys.path.insert(0, "/root/repo")
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.session import get_spark
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.catalog import publish_star_schema
spark = get_spark(app_name="catalog-publish", catalog_dir={d!r})
publish_star_schema(spark, {sf!r})
n = spark.sql("SELECT count(*) AS n FROM metro.store_quarterly_sales").first().n
print("PUBLISHED", n)
spark.stop()
"""

RESOLVE = """
import sys; sys.path.insert(0, "/root/repo")
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.session import get_spark
spark = get_spark(app_name="catalog-resolve", catalog_dir={d!r})
assert "sales_fact" in [t.name for t in spark.catalog.listTables("metro")]
row = spark.sql(
    "SELECT count(*) AS n, CAST(sum(total_quarterly_revenue) AS DOUBLE) AS rev "
    "FROM metro.store_quarterly_sales"
).first()
print("RESOLVED", row.n, row.rev)
spark.stop()
"""


def _run(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_view_survives_into_a_fresh_session(tmp_path):
    d = str(tmp_path / "catalog")
    out1 = _run(PUBLISH.format(d=d, sf=SF_DIR))
    n_published = int(
        next(l for l in out1.splitlines() if l.startswith("PUBLISHED")).split()[1]
    )
    assert n_published > 0
    out2 = _run(RESOLVE.format(d=d))
    fields = next(
        l for l in out2.splitlines() if l.startswith("RESOLVED")
    ).split()
    assert int(fields[1]) == n_published
    assert float(fields[2]) > 0


STATS = """
import sys; sys.path.insert(0, "/root/repo")
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.session import get_spark
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.catalog import publish_star_schema
spark = get_spark(app_name="catalog-stats", catalog_dir={d!r})
publish_star_schema(spark, {sf!r})
# row-count statistics landed in the catalog
desc = spark.sql("DESCRIBE TABLE EXTENDED metro.products").collect()
stats = [r for r in desc if r.col_name == "Statistics"]
assert stats and "rows" in stats[0].data_type, desc
print("STATS", stats[0].data_type)
# a dimension join broadcasts WITHOUT a hint: the catalog's size
# statistics drive the build-side decision (the knob a 100 TB
# deployment turns so an outgrown dim flips off broadcast correctly)
plan = spark.sql(
    "SELECT p.product_name, sum(f.revenue_cents) AS c "
    "FROM metro.sales_fact f JOIN metro.products p "
    "ON f.product_id = p.product_id GROUP BY p.product_name"
)._jdf.queryExecution().executedPlan().toString()
assert "BroadcastHashJoin" in plan, plan[:3000]
print("BROADCAST OK")
spark.stop()
"""


def test_published_stats_drive_broadcast_decision(tmp_path):
    """publish_star_schema(analyze=True) records row/size stats
    (ANALYZE TABLE equivalent) and dimension joins on the catalog
    tables broadcast hint-free off those stats."""
    out = _run(STATS.format(d=str(tmp_path / "catalog"), sf=SF_DIR))
    assert "STATS" in out and "rows" in out
    assert "BROADCAST OK" in out
