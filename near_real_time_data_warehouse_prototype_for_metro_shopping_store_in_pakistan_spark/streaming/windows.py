"""Event-time streaming operators: watermarked tumbling-window
aggregation and custom stateful sessionization.

The reference has no event-time semantics at all (SURVEY §2.9 ST6 —
event time only feeds the time dimension); these are the streaming
shapes a production event pipeline needs, built as the streaming twins
of ``operators.events``:

- ``streaming_hourly_rollup`` = ``events.hourly_rollup`` with
  ``withWatermark + window()`` — late events beyond the watermark are
  dropped, state is bounded, append mode emits each window once when
  the watermark passes its end.
- ``streaming_sessionize`` = ``events.sessionize`` as an
  ``applyInPandasWithState`` operator: per-user state carries the open
  session; a session closes (and is emitted, append mode) when a gap
  > ``gap_us`` arrives. Arrow-batched, grouped state — the Structured
  Streaming path for operators Spark's built-ins can't express
  (gap-based sessions need per-key ordered state, not a fixed window).

Scale notes: both shuffle exactly once on their grouping key
(window/event_type, user_id); state store size is O(open windows) /
O(active users), bounded by the watermark / gap. ``value`` sums use
integer cents like the batch twins (plans.star determinism note).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # mirror operators.events

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

# open-session state: (session_seq, start_us, last_us, n_events, cents)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
    ]
)


def read_event_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Parquet file-source stream of event rows."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def streaming_hourly_rollup(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window rollup (streaming twin of
    ``events.hourly_rollup``; exact-distinct user counts are not
    streamable in append mode, so that column lives only on the batch
    side — a streaming variant would pre-dedup or approx_count_distinct).
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def streaming_session_window_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native stateful sessions: ``session_window`` + watermark (the
    built-in alternative to the ``applyInPandasWithState`` sessionizer
    below; Spark merges/extends session state per key and emits a
    session once the watermark passes its close)."""
    from ..operators.events import session_window_rollup

    return session_window_rollup(events.withWatermark("ts", watermark), gap)


def streaming_deduplicate(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Cross-batch streaming dedup with bounded state: duplicates of a
    key are dropped for as long as the key can still legally arrive
    (the watermark horizon), then its state is evicted —
    ``dropDuplicatesWithinWatermark``. This is the scalable form of
    the reference's grow-forever ``allRecords.contains`` source dedup
    (src/GenerateStream.java:14,38-43; SURVEY ST4/ST6)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user stateful pass: close + emit sessions on gap > gap_us.

    Events inside a micro-batch are sorted by (ts, event_id); ordering
    ACROSS batches must come from the source (time-rolled files), the
    standard contract for file-replayed event logs.
    """
    (user_id,) = key
    if state.exists:
        seq, start_us, last_us, n, cents = state.get
    else:
        seq, start_us, last_us, n, cents = 0, None, None, 0, 0

    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        # normalize to epoch micros regardless of pandas datetime unit
        ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
        # HALF_UP cents, matching the batch twin's F.round(value*100, 0)
        # — pandas .round() is half-EVEN and would diverge at exact
        # half-cent values (2.125 → 212 vs 213).
        v = (pdf["value"] * 100).to_numpy()
        ev_cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
        for t_us, c in zip(ts_us, ev_cents):
            t_us = int(t_us)
            if last_us is None or t_us - last_us > SESSION_GAP_US:
                if last_us is not None:
                    closed.append((user_id, seq, start_us, last_us, n, cents))
                seq += 1
                start_us, n, cents = t_us, 0, 0
            last_us = t_us
            n += 1
            cents += int(c)

    state.update((seq, start_us, last_us, n, cents))
    if not closed:
        return
    out = pd.DataFrame(
        closed,
        columns=[
            "user_id", "session_seq", "start_us", "end_us", "n_events", "cents",
        ],
    )
    yield pd.DataFrame(
        {
            "user_id": out["user_id"],
            "session_seq": out["session_seq"],
            "session_start": pd.to_datetime(out["start_us"], unit="us"),
            "session_end": pd.to_datetime(out["end_us"], unit="us"),
            "n_events": out["n_events"],
            "value_sum": out["cents"] / 100.0,
        }
    )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    ``applyInPandasWithState`` (streaming twin of
    ``events.sessionize``). Emits a session exactly once, when the
    first event beyond its gap closes it; the open tail session stays
    in state (downstream flushes it with a sentinel event or timeout).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
