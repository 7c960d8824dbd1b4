"""Streaming EXACT quantiles — the incremental twin of
``operators.events.value_quantiles``.

Classic quantiles resist streaming because order statistics over raw
rows aren't mergeable, which is why streaming systems reach for
approximate sketches (t-digest, KLL). The counting formulation
sidesteps that: the sufficient statistic is the (key, cents) -> count
relation, and counts ADD. Each micro-batch aggregates to its own tiny
count delta and merges it into a versioned state table; exact
quantiles for everything seen so far come from the same
``quantiles_from_counts`` rank logic the batch operator uses. No
approximation, no unbounded per-row state — state is bounded by the
number of DISTINCT money values, not events.

Exactly-once: state versions are keyed by micro-batch id. A replayed
batch (failure/restart) sees its version already present and skips —
the merge is idempotent per batch id. Versions are written to a temp
path and atomically renamed (local filesystem; on a cluster an ACID
table format — Delta/Iceberg MERGE — carries the same plan shape).

Reference anchor: the reference keeps *running totals* across batches
(src/Meshjoin.java:706-707,745-746); this is the same
incrementally-maintained-aggregate idea upgraded to a full
distribution summary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.events import (
    QUANTILE_PCTS,
    quantiles_from_counts,
    value_counts,
)
from .windows import read_event_stream

COUNTS_SCHEMA = "event_type string, _c long, _n long"


def _version_dirs(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def latest_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The most recent merged count state, or None before any batch."""
    versions = _version_dirs(state_dir)
    if not versions:
        return None
    return spark.read.schema(COUNTS_SCHEMA).parquet(
        f"{state_dir}/v{versions[-1]:09d}"
    )


def apply_counts_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    value_col: str = "value",
    key_col: str = "event_type",
) -> None:
    """Merge one micro-batch's count delta into the state — the
    foreachBatch body, module-level so idempotency is unit-testable.

    Re-applying the same ``batch_id`` is a no-op (its version already
    exists), which is exactly the replay contract foreachBatch needs.
    """
    final = f"{state_dir}/v{batch_id:09d}"
    if os.path.isdir(final):
        return  # replayed batch: already merged
    delta = value_counts(batch, value_col, key_col)
    prev = latest_counts(spark, state_dir)
    if prev is not None:
        from pyspark.sql import functions as F

        merged = (
            prev.unionByName(delta)
            .groupBy(key_col, "_c")
            .agg(F.sum("_n").alias("_n"))
        )
    else:
        merged = delta
    tmp = f"{state_dir}/_tmp_v{batch_id:09d}"
    # The count state is distinct-value-bounded (tiny next to the
    # event volume); one output file keeps version swaps atomic.
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final)
    # Retention: each version is a FULL state copy, so an unbounded
    # stream would otherwise accumulate O(batches) copies. Keep the
    # newest two (current + the base a replayed successor would need);
    # older versions can never be read again.
    import shutil

    for v in _version_dirs(state_dir)[:-2]:
        shutil.rmtree(f"{state_dir}/v{v:09d}", ignore_errors=True)


def stream_value_quantiles(
    spark: SparkSession,
    events_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the incremental quantile maintenance over an event-file
    stream. Query results come from ``quantiles_so_far`` at any time —
    the state is always a consistent prefix of the stream."""
    stream = read_event_stream(spark, events_dir, max_files_per_trigger)

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_counts_batch(spark, state_dir, batch, batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quantiles_so_far(
    spark: SparkSession,
    state_dir: str,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    key_col: str = "event_type",
) -> DataFrame:
    """Exact quantiles over every event merged so far (empty result
    before the first batch)."""
    counts = latest_counts(spark, state_dir)
    if counts is None:
        counts = spark.createDataFrame([], COUNTS_SCHEMA)
    return quantiles_from_counts(counts, pcts, key_col)
