"""Range (interval-containment) join — point-in-interval matching as
a composition of DataFrame ops, the second custom join Spark's
built-ins lack (alongside ``operators.asof``).

A naive ``points.join(intervals, key & (lo <= t) & (t <= hi))`` gives
Catalyst only a residual theta predicate after the key — fine when the
key is selective, quadratic per key when it isn't (one user's million
events × thousand intervals). The scalable formulation **bins time**:
each interval explodes into the fixed-width bins it covers, each point
computes its single bin, and the join becomes a pure equi-join on
(key, bin) with the BETWEEN check as a cheap residual filter. Work is
proportional to matches + interval-length/bin_width, not to the per-key
cross product.

Bin width trades replication for selectivity: ~the typical interval
length is right (each interval lands in O(1) bins); far smaller
explodes rows, far larger degrades to the per-key cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_time: str,
    interval_start: str,
    interval_end: str,
    bin_width_us: int = 30 * 60 * 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval row(s) containing it
    (``interval_start <= point_time <= interval_end``, same key).
    Column sets must be disjoint apart from ``on``.

    ``how="left"`` additionally keeps each unmatched point row once
    (interval columns null). Point-row identity is a deterministic
    per-key sequence number — NOT the point's column values — so
    legitimately duplicate point rows are each preserved, null point
    keys pass through as unmatched, and interval payload columns that
    are genuinely NULL cannot be mistaken for "no match" (the match
    test is the join itself, never an isNotNull on a payload column).
    """
    assert how in ("inner", "left")
    key = list(on)
    reserved = {"_bin", "_pt_seq"}
    clash = reserved & (set(points.columns) | set(intervals.columns))
    assert not clash, f"interval_join reserves columns {sorted(reserved)}: {clash}"
    p_us = F.unix_micros(F.col(point_time))
    lo_us = F.unix_micros(F.col(interval_start))
    hi_us = F.unix_micros(F.col(interval_end))
    contained = F.col(point_time).between(
        F.col(interval_start), F.col(interval_end)
    )

    def binned_ivals(ivals: DataFrame) -> DataFrame:
        return ivals.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    (lo_us / bin_width_us).cast("long"),
                    (hi_us / bin_width_us).cast("long"),
                )
            ),
        )

    if how == "inner":
        binned_points = points.withColumn("_bin", (p_us / bin_width_us).cast("long"))
        joined = binned_points.join(binned_ivals(intervals), key + ["_bin"])
        return joined.filter(contained).drop("_bin")
    # left: tag every point row with a deterministic (key, seq)
    # identity (ties among fully-identical rows are interchangeable),
    # inner-join for matches, anti-join the identities for the rest.
    from pyspark.sql import Window

    w = Window.partitionBy(*key).orderBy(
        point_time, *[F.col(c).asc_nulls_last() for c in points.columns]
    )
    pts = points.withColumn("_pt_seq", F.row_number().over(w))
    binned_points = pts.withColumn("_bin", (p_us / bin_width_us).cast("long"))
    matched = (
        binned_points.join(binned_ivals(intervals), key + ["_bin"])
        .filter(contained)
        .drop("_bin")
    )
    ival_cols = [c for c in intervals.columns if c not in key]
    unmatched = pts.join(
        matched.select(*key, "_pt_seq").dropDuplicates(key + ["_pt_seq"]),
        key + ["_pt_seq"],
        "left_anti",
    ).select(
        *pts.columns,
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in ival_cols
        ],
    )
    out_cols = points.columns + ival_cols
    return matched.select(*out_cols, "_pt_seq").unionByName(unmatched.select(*out_cols, "_pt_seq")).drop("_pt_seq")
