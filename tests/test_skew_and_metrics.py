"""Salted-join equivalence, ETL observe metrics, and streaming dedup
with bounded state."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    skew,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.etl import (
    build_fact,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.csv_inputs import (
    read_customers_master,
    read_products_master,
    read_transactions,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    read_events,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.windows import (
    read_event_stream,
    streaming_deduplicate,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def test_salted_join_equals_plain_join(spark, sf_dir):
    # skewed side: lineitem keyed by suppkey (each key ~hot relative to
    # the tiny supplier side); plain join is the semantic oracle
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(supp, ["l_suppkey"])
    salted = skew.salted_join(li, supp, ["l_suppkey"], num_salts=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    plain = left.join(right, ["k"], "left")
    salted = skew.salted_join(left, right, ["k"], num_salts=3, how="left")
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_etl_observe_counts_dropped_records(spark, tmp_path):
    from .test_etl import CUSTOMERS_CSV, PRODUCTS_CSV, TRANSACTIONS_CSV

    (tmp_path / "p.csv").write_text(PRODUCTS_CSV)
    (tmp_path / "c.csv").write_text(CUSTOMERS_CSV)
    # one transaction referencing neither a known product nor customer
    orphan = "ORD9999,2019-03-02 10:00:00,P-NOPE,2,C-NOPE,T9999\n"
    (tmp_path / "t.csv").write_text(TRANSACTIONS_CSV + orphan)

    products = read_products_master(spark, str(tmp_path / "p.csv"))
    customers = read_customers_master(spark, str(tmp_path / "c.csv"))

    (tmp_path / "t_base.csv").write_text(TRANSACTIONS_CSV)
    base_obs = Observation("etl_base")
    build_fact(
        read_transactions(spark, str(tmp_path / "t_base.csv")),
        products, customers, observation=base_obs,
    ).count()

    obs = Observation("etl")
    fact = build_fact(
        read_transactions(spark, str(tmp_path / "t.csv")),
        products, customers, observation=obs,
    )
    n_fact = fact.count()
    got = obs.get
    # exactly the injected orphan is dropped on top of the baseline
    assert got["n_dropped"] == base_obs.get["n_dropped"] + 1
    assert got["n_input"] == got["n_matched"] + got["n_dropped"]
    assert n_fact <= got["n_matched"]  # dedup by order_id may reduce further


def test_streaming_dedup_bounded_state(spark, sf_dir, tmp_path):
    src = read_events(spark, sf_dir).limit(500)
    stream_dir = str(tmp_path / "events")
    src.coalesce(1).write.mode("append").parquet(stream_dir)
    # re-deliver a subset: an at-least-once source replay
    src.limit(100).coalesce(1).write.mode("append").parquet(stream_dir)

    out = streaming_deduplicate(
        read_event_stream(spark, stream_dir, max_files_per_trigger=1),
        key_cols=["event_id"],
    )
    q = (
        out.writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_stream").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)) == src.count()
