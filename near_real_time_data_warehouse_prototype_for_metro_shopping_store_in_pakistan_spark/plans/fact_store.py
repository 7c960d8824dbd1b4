"""Manifest-backed Sales_Fact with order_date zone maps + clustered
compaction — file-level date pruning WITHIN what hive partitioning
can only slice by month.

The OLAP fact path (``plans.star.sales_fact``) memoizes an in-memory
join; the ETL warehouse persists hive-partitioned by (year, month).
Both prune a date-bounded probe to month granularity at best. This
variant stores the SAME fact rows in a ``ManifestParquetSink`` (the
transactional segment store of ``operators.sinks``) with:

- ``stats_cols=[order_date]`` zone maps harvested from parquet
  footers at commit, and
- a range-CLUSTERED compaction (``compact(cluster_by=[order_date])``)
  so each output file owns a disjoint date band

— after which ``scan(fact, {order_date: (lo, hi)})`` opens
O(matching bands) files: a one-week probe over years of data reads
<50% (in practice ~1/FILES) of the table's files, asserted by
``prune_files_report`` in tests/scalecheck. Correctness is pinned by
the ``q17_week_probe_zonemap`` contract row: hash-exact against the
same aggregate computed by DuckDB over the raw join (scan ≡
read+filter is already a sink contract test; this row additionally
proves the derived STORE matches the source-of-truth join).

The ingest deliberately runs as several insert_if_absent batches
(simulating streaming cadence) before the clustering compaction —
the lifecycle a near-real-time deployment of this engine actually
has (reference equivalence: the MySQL fact table under
src/Meshjoin.java:612-626, which its storage engine keeps compact).

Fact grain: the synthetic lineitem carries NO unique natural key —
(l_orderkey, l_linenumber) collides (~25% of rows at every scale),
unlike TPC-H proper — but full rows are globally unique (checked at
sf0.001/0.01/0.1). The insert key is therefore ``line_uid``: md5 of
the full source row content, the same content-keyed-fact discipline
the corpus pipeline uses for documents. The uid never leaves the
store (query outputs drop it), so no cross-engine formatting concern
exists.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sinks import ManifestParquetSink, make_sink
from ..sources.testdata import table

FACT_TABLE = "sales_fact"
INGEST_BATCHES = 4
CLUSTER_FILES = 16
# bump when the stored layout changes — a stale cached build from an
# older code version must rebuild, not silently serve
_LAYOUT_VERSION = "v2"


def narrow_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact projection this store persists: lineitem grain,
    integer-cents revenue, no derived time attributes (they are
    recomputed at read; storing them would widen every file for
    columns a date probe never reads)."""
    li = table(spark, sf_dir, "lineitem")
    uid_cols = [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]
    li = li.withColumn(
        "line_uid",
        F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in uid_cols])),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "line_uid",
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").cast("int").alias("line_number"),
            F.col("l_partkey").alias("product_id"),
            F.col("l_suppkey").alias("supplier_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("l_quantity").alias("quantity_ordered"),
            F.round(
                F.col("l_extendedprice")
                * (F.lit(1) - F.col("l_discount"))
                * 100,
                0,
            )
            .cast("long")
            .alias("revenue_cents"),
            F.col("o_orderdate").alias("order_date"),
        )
    )


def fact_sink(spark: SparkSession, root: str) -> ManifestParquetSink:
    sink = make_sink(
        spark,
        root,
        keys={FACT_TABLE: ["line_uid"]},
        backend="manifest",
        stats_cols={FACT_TABLE: ["order_date"]},
    )
    assert isinstance(sink, ManifestParquetSink)
    return sink


def default_root(sf_dir: str) -> str:
    """Deterministic on-disk location per (layout version, sf dir) —
    the single-node stand-in for the warehouse's fact store path."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        "/tmp", "spark_graft_fact_store", f"{_LAYOUT_VERSION}_{tag}"
    )


def build_fact_store(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> ManifestParquetSink:
    """Idempotent build: ingest the fact in ``INGEST_BATCHES``
    insert-if-absent batches (streaming-cadence simulation), then one
    range-clustered compaction on ``order_date`` into
    ``CLUSTER_FILES`` files with disjoint date bands. A prior
    completed build (marker file) is reused — content is a pure
    function of the inputs, so the reuse is exact."""
    root = root or default_root(sf_dir)
    sink = fact_sink(spark, root)
    marker = os.path.join(root, "_FACT_BUILT")
    if os.path.exists(marker):
        return sink
    fact = narrow_fact(spark, sf_dir)
    for b in range(INGEST_BATCHES):
        sink.insert_if_absent(
            FACT_TABLE,
            fact.filter(F.col("order_id") % INGEST_BATCHES == b),
        )
    sink.compact(
        FACT_TABLE,
        target_partitions=CLUSTER_FILES,
        cluster_by=["order_date"],
    )
    with open(marker, "w") as fh:
        fh.write(_LAYOUT_VERSION)
    return sink


def week_probe(
    spark: SparkSession,
    sf_dir: str,
    lo: _dt.datetime,
    hi: _dt.datetime,
) -> DataFrame:
    """Zone-map-pruned one-week revenue probe over the fact store:
    per-day line count, quantity and revenue. The scan opens only
    files whose recorded order_date band intersects [lo, hi]."""
    sink = build_fact_store(spark, sf_dir)
    df = sink.scan(FACT_TABLE, {"order_date": (lo, hi)})
    if df is None:  # provably-empty probe
        raise ValueError(f"fact store at {sink.root} is empty")
    return (
        df.groupBy("order_date")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("quantity_ordered").cast("long").alias("total_qty"),
            (F.sum("revenue_cents") / 100.0).alias("total_revenue"),
        )
        .orderBy("order_date")
    )
