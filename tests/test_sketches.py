"""Sketch quality: the KMV distinct-count estimate must track the
exact distinct count (the oracle only proves the sketch is computed as
specified — this proves the specification estimates well)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    events as E,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    read_events,
)


def test_kmv_estimate_tracks_exact_distinct(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    est = {r.event_type: r.distinct_est for r in E.kmv_distinct_users(ev).collect()}
    true = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == true.keys()
    for t, n in true.items():
        rel_err = abs(est[t] - n) / n
        # k=64 -> ~1/sqrt(64) = 12.5% expected error; 35% is the alarm
        assert rel_err < 0.35, (t, n, est[t])
