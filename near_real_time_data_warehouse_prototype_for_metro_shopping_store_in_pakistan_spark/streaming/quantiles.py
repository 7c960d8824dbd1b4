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
batch (failure/restart) sees its version already committed and skips —
the merge is idempotent per batch id. Commit protocol is RENAME-FREE
and object-store-safe: each version directory holds the (multi-file)
parquet state plus a ``_COMMITTED.json`` manifest naming the data
files; the single manifest PUT is the commit point (atomic on any
store with atomic single-object writes — every object store, and
POSIX). Readers only ever see versions with a parseable manifest and
only read the files it names, so a crashed half-written version is
invisible. On a cluster an ACID table format (Delta/Iceberg MERGE)
carries the same plan shape with the same manifest-commit idea.

Reference anchor: the reference keeps *running totals* across batches
(src/Meshjoin.java:706-707,745-746); this is the same
incrementally-maintained-aggregate idea upgraded to a full
distribution summary.
"""

from __future__ import annotations

import json
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
COMMIT_MANIFEST = "_COMMITTED.json"


def _manifest_files(vdir: str) -> list[str] | None:
    """Data files named by a version's commit manifest, or None when
    the version is uncommitted (missing/unparseable manifest — e.g. a
    crash mid-write left a partial directory)."""
    try:
        with open(os.path.join(vdir, COMMIT_MANIFEST)) as fh:
            return list(json.load(fh)["files"])
    except (OSError, ValueError, KeyError):
        return None


def _version_dirs(state_dir: str) -> list[int]:
    """COMMITTED state versions (ascending). Uncommitted directories —
    in-flight or crashed writes — are excluded by construction."""
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
        and _manifest_files(os.path.join(state_dir, d)) is not None
    )


def latest_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The most recent committed count state, or None before any batch.

    Reads exactly the files the commit manifest names — never a
    directory listing — so concurrent/crashed writers can't leak
    partial files into a read."""
    versions = _version_dirs(state_dir)
    if not versions:
        return None
    vdir = f"{state_dir}/v{versions[-1]:09d}"
    files = _manifest_files(vdir)
    if not files:  # committed-empty state (all-null value batches)
        return spark.createDataFrame([], COUNTS_SCHEMA)
    return spark.read.schema(COUNTS_SCHEMA).parquet(
        *[os.path.join(vdir, f) for f in files]
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

    Re-applying the same ``batch_id`` is a no-op (its version is
    already committed), which is exactly the replay contract
    foreachBatch needs. A batch id at or below an OLDER committed
    version is refused: that only happens when a state dir is reused
    with a fresh checkpoint (batch ids restart at 0), and silently
    writing a version ``latest_counts`` would never read — and
    retention would delete — is a correctness trap, not a merge.
    """
    final = f"{state_dir}/v{batch_id:09d}"
    if _manifest_files(final) is not None:
        return  # replayed batch: already committed
    committed = _version_dirs(state_dir)
    if committed and batch_id <= committed[-1]:
        raise ValueError(
            f"quantile state {state_dir!r} already holds committed version "
            f"v{committed[-1]:09d} >= batch_id {batch_id}: the state dir is "
            "bound to a different (likely deleted/reset) checkpoint. Use a "
            "fresh state_dir with a fresh checkpoint_dir, or restore the "
            "matching checkpoint."
        )
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
    # Multi-file parallel write (count state is distinct-value-bounded,
    # so this is small — but nothing here assumes one task or one
    # file), then the single-object manifest PUT commits the version.
    # No renames anywhere: safe where rename is copy (object stores).
    merged.write.mode("overwrite").parquet(final)
    files = sorted(
        f for f in os.listdir(final)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    manifest = json.dumps({"batch_id": batch_id, "files": files})
    with open(os.path.join(final, COMMIT_MANIFEST), "w") as fh:
        fh.write(manifest)
    # Retention: each version is a FULL state copy, so an unbounded
    # stream would otherwise accumulate O(batches) copies. Keep the
    # newest two committed versions (current + the base a replayed
    # successor would need); older versions can never be read again.
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
