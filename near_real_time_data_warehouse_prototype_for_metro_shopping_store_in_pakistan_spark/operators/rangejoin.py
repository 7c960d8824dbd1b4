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
    """
    assert how in ("inner", "left")
    key = list(on)
    p_us = F.unix_micros(F.col(point_time))
    lo_us = F.unix_micros(F.col(interval_start))
    hi_us = F.unix_micros(F.col(interval_end))
    binned_points = points.withColumn("_bin", (p_us / bin_width_us).cast("long"))
    binned_ivals = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (lo_us / bin_width_us).cast("long"),
                (hi_us / bin_width_us).cast("long"),
            )
        ),
    )
    joined = binned_points.join(binned_ivals, key + ["_bin"], how)
    contained = F.col(point_time).between(
        F.col(interval_start), F.col(interval_end)
    )
    if how == "inner":
        return joined.filter(contained).drop("_bin")
    # left: keep unmatched points once; matched rows must satisfy
    # containment. Null-out non-containing matches then re-dedupe the
    # point against its own null row.
    ival_cols = [c for c in intervals.columns if c not in key]
    nulled = joined.select(
        *points.columns,
        *[
            F.when(contained, F.col(c)).alias(c) for c in ival_cols
        ],
    )
    matched = nulled.filter(F.col(ival_cols[0]).isNotNull())
    unmatched = (
        nulled.join(
            matched.select(*points.columns).dropDuplicates(points.columns),
            points.columns,
            "left_anti",
        )
        .dropDuplicates(points.columns)
    )
    return matched.unionByName(unmatched)
