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


def test_kmv_partial_bottom_k_bounds_and_preserves_sketch(spark):
    """The partial stage emits at most k rows per (batch, type) and
    never loses a hash that belongs to the global bottom-k."""
    import hashlib

    rows = [(i % 7, f"t{i % 3}") for i in range(5000)]
    ev = spark.createDataFrame(
        [(i, t, uid) for i, (uid, t) in enumerate(rows)],
        "event_id long, event_type string, user_id long",
    ).repartition(6)
    k = 4
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.functions.text import (
        md5_long,
    )

    hashed = ev.select("event_type", md5_long(F.col("user_id").cast("string")).alias("h"))
    part = E.kmv_partial_bottom_k(hashed, k).collect()
    n_parts = ev.rdd.getNumPartitions()
    assert len(part) <= n_parts * 3 * k  # bounded: partitions x types x k
    # global bottom-k per type from the partial == from the raw relation
    def bottom(rows_):
        by = {}
        for t, h in rows_:
            by.setdefault(t, set()).add(h)
        return {t: sorted(hs)[:k] for t, hs in by.items()}

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    raw = [(t, h(u)) for u, t in rows]
    assert bottom([(r.event_type, r.h) for r in part]) == bottom(raw)


def test_kmv_window_never_sees_full_width_input(spark, sf_dir):
    """Plan guard: the per-type rank window must sit ABOVE the Arrow
    partial shrink — a refactor that feeds the window every distinct
    user hash again is the 100 TB regression this pins against."""
    ev = read_events(spark, sf_dir)
    plan = (
        E.kmv_distinct_users(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "Window" in plan
    # tree prints parents first: the window must be upstream (printed
    # before) the partial MapInPandas stage that bounds its input
    assert plan.index("Window") < plan.index("MapInPandas"), plan
