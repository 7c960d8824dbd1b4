"""Event-stream analytics over the ``events`` table (event_id, ts,
user_id, event_type, value, props-JSON).

These are the batch shapes of the streaming operators in
``streaming/``: tumbling-window rollup, gap-based sessionization, and
JSON property extraction. Money-style ``value`` sums use integer cents
(see plans.star determinism note).

Scale notes: the rollup is a single hash aggregate keyed on
(window, type) — map-side combinable; sessionization shuffles once on
user_id and is then a linear window pass (at 100 TB: partition by
user_id, sort within partitions — exactly Spark's window exec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in microseconds


def hourly_rollup(events: DataFrame) -> DataFrame:
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(cents) / 100.0).alias("value_sum"),
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event exceeds ``gap_us`` microseconds. Ordering is
    (ts, event_id) — total, so the running sum is deterministic."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(ts_us).over(order)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), 1
    ).otherwise(0)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withColumn("session_seq", F.sum(is_new).over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("value_sum"),
        )
    )


def session_window_rollup(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Gap sessions via Spark's NATIVE ``session_window`` — the
    built-in counterpart of ``sessionize``. Semantics differ at the
    exact boundary (native merges while gap < g, the custom chain
    merges gap <= g) and the native window end is last-event + gap
    rather than last-event; otherwise the groupings coincide."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_window_end"),
            "n_events",
            "value_sum",
        )
    )


def multi_grain_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate: ONE pass produces every
    time granularity (year → month → day → hour + grand total) via
    ROLLUP grouping sets — the batch equivalent of maintaining
    per-grain materialized rollups, with Spark computing the partial
    aggregates hierarchically instead of four separate scans."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.select(
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
            F.hour("ts").alias("hour"),
            "value",
        )
        .rollup("year", "month", "day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("value_sum"),
        )
    )


# KMV (k-minimum-values) sketch size; estimate stays within ~1/sqrt(k)
KMV_K = 64
_KMV_SPACE = float(16**15)  # md5_long hash space (60-bit)


def kmv_partial_bottom_k(hashed: DataFrame, k: int = KMV_K) -> DataFrame:
    """Bounded PARTIAL aggregate for the KMV sketch: within each Arrow
    batch, keep only the k smallest distinct (event_type, h) hashes per
    type — a shuffle-free map pass whose output is O(batches · k ·
    types) rows regardless of how many distinct users a partition
    holds. Correct as a pre-aggregation because any hash among the
    global k smallest for its type is necessarily among its own
    batch's k smallest (bottom-k is mergeable, like the sketch
    itself)."""
    schema = hashed.schema

    def shrink(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.drop_duplicates()
                .sort_values(["event_type", "h"])
                .groupby("event_type", sort=False)
                .head(k)
            )

    return hashed.mapInPandas(shrink, schema)


def kmv_distinct_users(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Deterministic distinct-count SKETCH per event type: keep the k
    smallest distinct md5 hashes of user_id; estimate
    |distinct| ≈ (k-1) · |hash space| / kth-smallest-hash.

    The mergeable-sketch shape of approx_count_distinct, but built on
    the portable md5 hash so the estimate is bit-identical in the
    DuckDB oracle (HLL implementations differ per engine and can't be
    oracle-checked). Plan shape: the hash is JVM codegen (md5_long),
    then ``kmv_partial_bottom_k`` shrinks each partition map-side to
    ≤ k·types rows per Arrow batch BEFORE anything shuffles — so the
    dedup + per-type rank stage exchanges O(partitions · k · types)
    rows, not O(distinct users). The pre-shrink is what makes the
    sketch behave like a sketch at 100 TB: without it the per-type
    window sorted every distinct user hash in one task per type.
    """
    from ..functions.text import md5_long
    from pyspark.sql import Window

    h = md5_long(F.col("user_id").cast("string"))
    hashed = events.select("event_type", h.alias("h"))
    shrunk = kmv_partial_bottom_k(hashed, k).dropDuplicates(
        ["event_type", "h"]
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = shrunk.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((k - 1) * F.lit(_KMV_SPACE) / F.col("kth"))
    return agg.select("event_type", "n_kept", "kth", est.alias("distinct_est"))


def json_property_rollup(events: DataFrame, key: str = "k") -> DataFrame:
    """Extract an integer property from the JSON ``props`` column and
    aggregate per event type."""
    k = F.get_json_object(F.col("props"), f"$.{key}").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


QUANTILE_PCTS = (50, 90, 99)


def value_quantiles(
    events: DataFrame,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    value_col: str = "value",
    key_col: str = "event_type",
) -> DataFrame:
    """EXACT distributed quantiles of the money column per key, by
    counting rather than sorting rows.

    The classic single-node formulation sorts all rows and indexes into
    the order — a global sort. Here the rows collapse first to
    (key, cents) -> count (ONE map-side-combinable aggregate; the
    shuffled relation is bounded by the number of DISTINCT values, not
    rows), then a cumulative sum over each key's distinct values turns
    counts into ranks, and quantile p is the smallest value whose
    cumulative count reaches rank ceil(p·n/100) (1-based, clamped to
    >= 1 — verified equal to DuckDB's ``quantile_disc`` for all n).
    Thresholds use integer arithmetic ((n·p + 99) div 100), never
    float ceil, so both engines agree at every boundary. At 100 TB the
    per-key value domain (price points in cents) is orders of
    magnitude smaller than the row count — the window input is tiny
    and partitioned by key.

    Rows: (key, pct, n_rows, value_cents, value).
    """
    return quantiles_from_counts(value_counts(events, value_col, key_col), pcts, key_col)


def value_counts(
    events: DataFrame, value_col: str = "value", key_col: str = "event_type"
) -> DataFrame:
    """(key, _c cents, _n count) — the sufficient statistic for exact
    discrete quantiles. NULL money values are excluded from both ranks
    and n_rows — the same semantic as SQL discrete-quantile aggregates
    (DuckDB quantile_disc ignores NULLs); a NULL would otherwise sort
    first and could be emitted as a "quantile". The relation is
    MERGEABLE (counts add), which is what makes the streaming twin in
    ``streaming.quantiles`` incremental."""
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        events.filter(F.col(value_col).isNotNull())
        .select(F.col(key_col), cents.alias("_c"))
        .groupBy(key_col, "_c")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def quantiles_from_counts(
    counts: DataFrame,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    key_col: str = "event_type",
) -> DataFrame:
    """Rank-and-pick stage shared by the batch and streaming quantile
    paths: cumulative counts over each key's distinct values, smallest
    value whose rank reaches the integer ceil threshold per pct."""
    run = Window.partitionBy(key_col).orderBy("_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("_cum", F.sum("_n").over(run))
    totals = counts.groupBy(key_col).agg(F.sum("_n").alias("n_rows"))
    j = cum.join(totals, key_col)
    q_aggs = []
    for p in pcts:
        thr = F.expr(f"greatest((n_rows * {p} + 99) div 100, 1)")
        q_aggs.append(
            F.min(F.when(F.col("_cum") >= thr, F.col("_c"))).alias(f"_q{p}")
        )
    wide = j.groupBy(key_col, "n_rows").agg(*q_aggs)
    stack_args = ", ".join(f"{p}, _q{p}" for p in pcts)
    return wide.select(
        key_col,
        "n_rows",
        F.expr(
            f"stack({len(pcts)}, {stack_args}) AS (pct, value_cents)"
        ),
    ).select(
        key_col,
        F.col("pct").cast("int").alias("pct"),
        "n_rows",
        "value_cents",
        (F.col("value_cents") / 100.0).alias("value"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-sequence funnel: per user, step i is reached at the
    EARLIEST event of its type strictly after the user's step-(i-1)
    time; output is one row per step with the user count and the
    conversion rate from step 0. The sequential-pattern analytics
    shape (A then B then C) the rollup/session family doesn't cover.

    Plan: one exchange — every step time is a min-over-CASE window
    partitioned by user (successive steps reference the previous
    step's column, all over the SAME partitioning, so Spark reuses one
    sort/exchange), then a single tiny aggregate; no per-user
    collect_list, no join per step, no global window. Determinism:
    counts are integers, conversion is an int/int division.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"_t{i - 1}"))
        df = df.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    per_user = df.select(
        user_col, *[f"_t{i}" for i in range(len(steps))]
    ).distinct()
    counts = per_user.agg(
        *[F.count(f"_t{i}").alias(f"c{i}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"), F.col("c0").alias("_c0"))
        .select(
            F.col("r.step").alias("step"),
            F.col("r.step_name").alias("step_name"),
            F.col("r.n_users").alias("n_users"),
            F.when(
                F.col("_c0") > 0, F.col("r.n_users") / F.col("_c0")
            ).otherwise(F.lit(0.0)).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST
    active day; each (cohort_date, day_offset) cell counts the
    cohort's users active that many days later — the
    acquisition-retention analytics shape (triangle matrix) next to
    the funnel.

    Plan: one groupBy(user) min for the cohort assignment, a
    broadcast-eligible join back (the per-user relation is ≤ one row
    per user), then one map-side-combinable distinct-count aggregate
    on (cohort, offset). Counts are exact integers.
    """
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(day).alias("cohort_date")
    )
    return (
        events.select(user_col, day.alias("_day"))
        .join(firsts, user_col)
        .groupBy(
            "cohort_date",
            F.datediff(F.col("_day"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
