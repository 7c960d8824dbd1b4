"""Pluggable transactional insert-if-absent sinks.

Every idempotent table in the engine — the star-schema warehouse
(``operators.etl.ParquetWarehouse``), the curated corpus
(``streaming.corpus``), and the streaming IVF index
(``streaming.ann_index``) — shares ONE protocol: *insert each incoming
row unless a row with its key already exists*. That protocol is the
Spark re-expression of the reference's per-row ``alreadyExists`` +
INSERT pattern (src/Meshjoin.java:612-626), and it is what makes
at-least-once streaming replays no-ops.

Two physical backends implement it:

- ``ParquetAntiJoinSink`` (default): plain parquet + a per-batch
  left-anti join against the existing keys, partition-pruned to only
  the hive partitions the batch touches. Crash-safe for at-least-once
  SINGLE-WRITER upstreams (a replayed batch is filtered by key);
  concurrent writers could race between the anti-join read and the
  append — exactly the caveat the reference shares with its single
  consumer thread.
- ``DeltaMergeSink``: the same contract as one atomic
  ``MERGE ... WHEN NOT MATCHED THEN INSERT`` per batch against a
  Delta table — the transactional form that stays correct under
  concurrent writers and readers (optimistic concurrency at the
  table log). Env-gated on the ``delta`` package (like the PIL image
  path): constructing it without ``delta-spark`` installed raises
  ``ImportError`` with the contract, and tests for it are
  skip-marked where the package is absent.

Both backends expose the same three methods (``path``, ``read``,
``insert_if_absent``), so every façade takes a ``backend=`` switch and
the streaming/replay semantics are backend-independent (asserted by
the shared contract tests in tests/test_sinks.py).

At 100 TB the MERGE backend is the one to deploy: the anti-join sink's
read-then-append is two operations, while Delta/Iceberg commit the
key-join and the file additions as one log entry, and their MERGE
pushes the same partition pruning this module does by hand.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    """True when the ``delta-spark`` package is importable (the Delta
    backend is optional, like PIL for real image decode)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


@dataclass
class MergeSink:
    """Shared shape of a keyed insert-if-absent table store.

    ``keys`` maps table name -> dedup key columns; ``partitioning``
    maps table name -> hive partition columns (used for directory
    pruning by the parquet backend and passed to ``partitionBy`` on
    first write by both).
    """

    spark: SparkSession
    root: str
    keys: dict[str, list[str]] = field(default_factory=dict)
    partitioning: dict[str, list[str]] = field(default_factory=dict)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame | None:  # pragma: no cover
        raise NotImplementedError

    def insert_if_absent(self, name: str, batch: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError


@dataclass
class ParquetAntiJoinSink(MergeSink):
    """Idempotent insert-if-absent parquet sink (= the reference's
    ``alreadyExists`` + INSERT pattern, src/Meshjoin.java:612-626, as a
    per-batch left-anti join).

    Plain-parquet caveat (SURVEY §7): append-only with key-anti-join is
    crash-safe for at-least-once upstreams because replayed rows are
    filtered; concurrent writers would need a transactional table
    format (= ``DeltaMergeSink``) — single-writer here, like the
    reference's single consumer thread.
    """

    def read(self, name: str) -> DataFrame | None:
        p = self.path(name)
        try:
            return self.spark.read.parquet(p)
        except Exception:
            return None

    def _existing_keys(
        self, name: str, incoming: DataFrame, existing: DataFrame
    ) -> DataFrame:
        """Key column(s) of already-written rows, scoped to only the
        hive partitions the incoming batch touches.

        Without the scope, every micro-batch anti-joins against the
        ENTIRE accumulated table's keys — O(batches × fact-keys) total
        work, a smaller cousin of the reference's quadratic rescan
        (src/Meshjoin.java:612-626). Instead: collect the batch's
        distinct partition tuples (metadata-scale — a micro-batch
        touches a handful of (year, month) partitions) and turn them
        into static ``PartitionFilters`` on the existing-side parquet
        scan, so the anti-join reads only those directories.

        Correctness requires the dedup key to determine the partition
        values — true for this schema (``order_id`` fixes
        ``order_date`` hence (year, month)), and trivially true for
        at-least-once replay, where duplicate rows are bit-identical
        and land in the same partition.
        """
        key = self.keys[name]
        parts = self.partitioning.get(name)
        if parts and set(parts) <= set(incoming.columns):
            touched = incoming.select(*parts).distinct().collect()
            pred = F.lit(False)
            for row in touched:
                clause = F.lit(True)
                for p in parts:
                    clause = clause & (F.col(p) == F.lit(row[p]))
                pred = pred | clause
            existing = existing.filter(pred)
        return existing.select(*key).dropDuplicates(key)

    def insert_if_absent(self, name: str, batch: DataFrame) -> None:
        key = self.keys[name]
        incoming = batch.dropDuplicates(key)
        existing = self.read(name)
        parts = self.partitioning.get(name)
        # The partition-tuple pre-pass computes the batch once before
        # the write does — persist across the two passes so the ETL
        # join pipeline isn't re-derived.
        pinned = incoming if parts is not None and existing is not None else None
        if pinned is not None:
            incoming = pinned.persist()
        try:
            if existing is not None:
                # null-safe (<=>) anti-join so a NULL-keyed row, once
                # admitted, is treated as existing on replay — the
                # same semantics the MERGE backend's <=> condition has
                # (a plain equality join would never match NULL and
                # re-insert it every replay)
                seen = self._existing_keys(name, incoming, existing)
                seen = seen.select(
                    *[F.col(k).alias(f"__seen_{k}") for k in key]
                )
                cond = F.lit(True)
                for k in key:
                    cond = cond & F.col(k).eqNullSafe(F.col(f"__seen_{k}"))
                incoming = incoming.join(seen, cond, "left_anti")
                # align column order for parquet append
                incoming = incoming.select(*existing.columns)
            writer = incoming.write.mode("append")
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(self.path(name))
        finally:
            if pinned is not None:
                pinned.unpersist()


@dataclass
class DeltaMergeSink(MergeSink):
    """Insert-if-absent as one atomic Delta ``MERGE`` per batch.

    Same contract as ``ParquetAntiJoinSink`` — first writer of a key
    wins, replays are no-ops — but the key-match and the file commit
    are a single transaction in the Delta log, so the sink stays
    correct under concurrent writers and readers (the anti-join sink's
    read-then-append window disappears). Delta's MERGE also performs
    the partition/file pruning this repo's parquet sink implements by
    hand (its metadata keeps per-file key min/max).

    Requires the optional ``delta-spark`` package AND a session built
    with the Delta SQL extension + catalog (see
    ``delta_session_builder_conf``); both are environment concerns,
    not logic: every test for this backend is skip-marked when
    ``delta_available()`` is false.
    """

    def __post_init__(self) -> None:
        if not delta_available():
            raise ImportError(
                "DeltaMergeSink requires the optional 'delta-spark' "
                "package (pip install delta-spark) and a SparkSession "
                "configured with the Delta extension/catalog; use the "
                "default ParquetAntiJoinSink otherwise — same "
                "insert-if-absent contract, single-writer only"
            )

    def read(self, name: str) -> DataFrame | None:
        try:
            return self.spark.read.format("delta").load(self.path(name))
        except Exception:
            return None

    def insert_if_absent(self, name: str, batch: DataFrame) -> None:
        from delta.tables import DeltaTable

        key = self.keys[name]
        incoming = batch.dropDuplicates(key)
        path = self.path(name)
        if not DeltaTable.isDeltaTable(self.spark, path):
            writer = incoming.write.format("delta").mode("append")
            parts = self.partitioning.get(name)
            if parts:
                writer = writer.partitionBy(*parts)
            writer.save(path)
            return
        target = DeltaTable.forPath(self.spark, path)
        # <=> so NULL key components behave like the anti-join backend
        # (SQL null-safe equality, not three-valued =)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key)
        (
            target.alias("t")
            .merge(incoming.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )


def delta_session_builder_conf() -> dict[str, str]:
    """The two session configs a Delta-capable SparkSession needs —
    exposed so callers (and tests) build it the documented way instead
    of copy-pasting config keys."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


BACKENDS = {"parquet": ParquetAntiJoinSink, "delta": DeltaMergeSink}


def make_sink(
    spark: SparkSession,
    root: str,
    keys: dict[str, list[str]],
    partitioning: dict[str, list[str]] | None = None,
    backend: str = "parquet",
) -> MergeSink:
    """Construct the requested sink backend.

    ``backend``: ``"parquet"`` (default — works everywhere,
    single-writer), ``"delta"`` (transactional MERGE, requires
    delta-spark), or ``"auto"`` (delta when importable, else parquet).
    """
    if backend == "auto":
        backend = "delta" if delta_available() else "parquet"
    try:
        cls = BACKENDS[backend]
    except KeyError:
        raise ValueError(
            f"unknown sink backend {backend!r}: expected one of "
            f"{sorted(BACKENDS)} or 'auto'"
        ) from None
    return cls(spark, root, keys=keys, partitioning=partitioning or {})
