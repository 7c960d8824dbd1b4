"""Streaming pipeline observability: a ``StreamingQueryListener``
that turns Spark's per-batch progress events into a durable JSONL
metrics feed — the input a near-real-time warehouse's health
dashboard tails (batch lateness, rows/sec, state growth).

This complements the row-level ``observe`` counters the ETL join
plants (operators/etl.py — dropped-record counts surface in the same
progress payload under ``observedMetrics``): ``observe`` answers
"what happened INSIDE the batch", the listener answers "how are
batches flowing". Both arrive through one event stream with no extra
jobs — Spark already computes every number here; recording them is
free.

Scale notes: events fire on the DRIVER asynchronously (never on the
hot path); the sink is an append-only local JSONL here — swap
``_emit`` for a Kafka/StatsD/OTel exporter on a cluster, the listener
contract is identical. Metrics rows are metadata-scale (one per
micro-batch per query).
"""

from __future__ import annotations

import json
import math
import threading
from collections import deque

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


def _finite(x):
    return x if isinstance(x, (int, float)) and math.isfinite(x) else None


class JsonlMetricsListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch:
    (query_id, run_id, batch_id, timestamp, numInputRows,
    inputRowsPerSecond, processedRowsPerSecond, batchDuration_ms,
    observed) — ``observed`` carries any ``df.observe(...)`` metrics
    (e.g. the ETL's dropped-record counters)."""

    # in-memory tail is for tests/inspection only — the FILE is the
    # durable record; the cap keeps week-long streams from growing an
    # unbounded list on the driver
    MEMORY_TAIL = 4096

    def __init__(self, out_path: str) -> None:
        self.out_path = out_path
        self._lock = threading.Lock()
        self.rows: deque[dict] = deque(maxlen=self.MEMORY_TAIL)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            # Spark reports NaN rates on a run's FIRST batch (no prior
            # trigger) and can report Infinity on a 0 ms batch;
            # json.dumps would emit literal NaN/Infinity — invalid
            # JSON that breaks strict consumers (jq, JSON.parse,
            # Spark's own reader). Non-finite -> null.
            "input_rows_per_second": _finite(p.inputRowsPerSecond),
            "processed_rows_per_second": _finite(p.processedRowsPerSecond),
            "batch_duration_ms": p.batchDuration,
            "observed": {
                k: v.asDict()
                for k, v in dict(p.observedMetrics or {}).items()
            },
        }
        self._emit(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def _emit(self, row: dict) -> None:
        with self._lock:
            self.rows.append(row)
            with open(self.out_path, "a") as f:
                f.write(json.dumps(row, default=str) + "\n")


def attach_metrics(spark: SparkSession, out_path: str) -> JsonlMetricsListener:
    """Register a JSONL metrics listener on the session; returns it so
    callers can ``spark.streams.removeListener(listener)`` when done."""
    listener = JsonlMetricsListener(out_path)
    spark.streams.addListener(listener)
    return listener
