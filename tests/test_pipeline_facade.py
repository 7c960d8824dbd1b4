"""MetroWarehouse façade (SURVEY §3.2): the user-facing construct ->
load_dimensions -> load_transactions / run_stream surface produces the
same warehouse as the underlying building blocks, batch ≡ stream."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.pipeline import (
    MetroWarehouse,
)

from .test_etl import CUSTOMERS_CSV, PRODUCTS_CSV, TRANSACTIONS_CSV


@pytest.fixture()
def fixture_dir(tmp_path):
    (tmp_path / "products.csv").write_text(PRODUCTS_CSV)
    (tmp_path / "customers.csv").write_text(CUSTOMERS_CSV)
    tx_dir = tmp_path / "tx"
    tx_dir.mkdir()
    (tx_dir / "transactions.csv").write_text(TRANSACTIONS_CSV)
    return tmp_path


def _fact_rows(wh: MetroWarehouse):
    fact = wh.table("sales_fact")
    assert fact is not None
    return sorted(
        (r.order_id, r.product_id, r.total_revenue) for r in fact.collect()
    )


def test_facade_batch_load(spark, fixture_dir):
    wh = MetroWarehouse(spark, str(fixture_dir / "wh_batch"))
    wh.load_dimensions(
        str(fixture_dir / "products.csv"), str(fixture_dir / "customers.csv")
    )
    # dims seeded
    assert wh.table("products").count() == 2  # bad-price row dropped
    assert wh.table("customers").count() == 2
    wh.load_transactions(str(fixture_dir / "tx" / "transactions.csv"))
    rows = _fact_rows(wh)
    # O1 (dedup), O2 (customer-path match), O6 survive; O4 bad date and
    # O5 bad qty fail validity; O3 matches neither master and is
    # dropped (reference semantics: src/Meshjoin.java:295-298)
    assert [r[0] for r in rows] == ["O1", "O2", "O6"]
    # totals surface works
    assert wh.totals().collect()[0].tot_revenue is not None


def test_facade_requires_dimension_seed(spark, fixture_dir):
    wh = MetroWarehouse(spark, str(fixture_dir / "wh_unseeded"))
    with pytest.raises(RuntimeError, match="load_dimensions"):
        wh.load_transactions(str(fixture_dir / "tx" / "transactions.csv"))


def test_facade_stream_equals_batch(spark, fixture_dir):
    batch = MetroWarehouse(spark, str(fixture_dir / "wh_b"))
    batch.load_dimensions(
        str(fixture_dir / "products.csv"), str(fixture_dir / "customers.csv")
    )
    batch.load_transactions(str(fixture_dir / "tx" / "transactions.csv"))

    streamed = MetroWarehouse(spark, str(fixture_dir / "wh_s"))
    streamed.load_dimensions(
        str(fixture_dir / "products.csv"), str(fixture_dir / "customers.csv")
    )
    q = streamed.run_stream(
        str(fixture_dir / "tx"), str(fixture_dir / "ckpt")
    )
    q.awaitTermination(120)
    assert _fact_rows(streamed) == _fact_rows(batch)
