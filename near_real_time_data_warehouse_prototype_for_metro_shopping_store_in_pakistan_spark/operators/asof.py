"""As-of (point-in-time) join — a custom operator Spark's built-ins
lack, expressed as a composition of DataFrame ops (no UDFs).

For each left row, attach the right row with the greatest
``right_time`` strictly before (``strict=True``) or at-or-before the
left row's ``left_time``, within the same key — the standard
point-in-time lookup (latest price before a trade, last click before
a purchase, dimension version at event time).

Implementation: the *merge* formulation. Both sides union into one
relation tagged with a sort priority; one window pass per key ordered
by (time, priority) carries the last-seen right payload forward
(``last(..., ignorenulls=True)``), and left rows read it. Cost: ONE
shuffle on the key + a sort within partitions — the same plan shape
as a sort-merge join, with none of the per-row range probing a naive
``left.join(right, right.t < left.t)`` + argmax would do (that
variant materializes every (left × earlier-right) pair).

Scale: at 100 TB both sides arrive bucketed by key; the union
preserves bucketing and the window sorts within partitions. Skewed
keys (one user with millions of events) sort locally — no cross-key
amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: dict[str, str],
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join. ``right_cols`` maps right column -> output
    name (output names must not collide with left's columns). Left
    rows with no qualifying right row keep nulls.

    ``tiebreak``: if the right side can hold several rows at the same
    (key, time), keep only the one with the maximum value of this
    column first — makes the match deterministic (mirrored in the
    DuckDB oracle).
    """
    key = list(on)
    reserved = {"_t", "_prio", "_pay", "_match", "_rn"}
    clash = reserved & (set(left.columns) | set(right.columns))
    assert not clash, (
        f"asof_join reserves internal column names {sorted(reserved)}; "
        f"rename input columns {sorted(clash)} before joining"
    )
    if tiebreak is not None:
        w0 = Window.partitionBy(*key, right_time).orderBy(F.desc(tiebreak))
        right = (
            right.withColumn("_rn", F.row_number().over(w0))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    payload = F.struct(
        *[F.col(src).alias(dst) for src, dst in right_cols.items()]
    )
    # strict '<': left sorts BEFORE right at equal time, so the
    # running last() cannot see a same-timestamp right row.
    l_prio, r_prio = (0, 1) if strict else (1, 0)
    r2 = right.select(
        *key,
        F.col(right_time).alias("_t"),
        F.lit(r_prio).alias("_prio"),
        payload.alias("_pay"),
    )
    l2 = left.select(
        *left.columns,
        F.col(left_time).alias("_t"),
        F.lit(l_prio).alias("_prio"),
    ).withColumn("_pay", F.lit(None).cast(r2.schema["_pay"].dataType))
    merged = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key)
        .orderBy("_t", "_prio")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col(f"_match.{dst}").alias(dst) for dst in right_cols.values()
    ]
    # left rows are the ones that carried left's columns (right-side
    # union rows have them null — but a left row may legitimately hold
    # nulls, so tag explicitly instead)
    return (
        filled.filter(F.col("_prio") == l_prio)
        .select(*out_cols)
    )
