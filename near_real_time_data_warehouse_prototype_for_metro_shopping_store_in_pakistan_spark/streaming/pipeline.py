"""Structured Streaming ETL: the reference's producer/consumer pipeline
(src/Main.java:9-19) as readStream -> foreachBatch.

Reference model: a producer thread reads the transactions CSV, dedups
exact duplicate lines, emits 50-record micro-batches into a bounded
queue; a consumer joins each batch against memory-resident master data
and upserts MySQL (SURVEY §2.9). Spark equivalents:

- CSV directory stream source with an explicit schema (ST1); batch
  size is an engine concern (``maxFilesPerTrigger`` / trigger), not
  semantics.
- Exact-duplicate source dedup (ST4) -> ``dropDuplicates`` inside each
  micro-batch + the key-based anti-join in the sink (cross-batch).
- Stream-static join (ST2) -> ``build_fact`` with broadcast masters.
- Idempotent exactly-once effect (ST3) -> ParquetWarehouse
  insert-if-absent + checkpointing; replays are filtered by key.

The reference has no watermarks or event-time windows (ST6) — state is
bounded by the sink's key sets, not by streaming state. For unbounded
cross-batch *exact-line* dedup one would add
``withWatermark + dropDuplicates``; here the fact key subsumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.etl import DEFAULT_FACT_KEY, warehouse_for
from ..operators.sinks import resolve_auto_compact
from ..sources.csv_inputs import TRANSACTIONS_SCHEMA
from ..functions.time import ORDER_DATE_FORMAT


def read_transaction_stream(
    spark: SparkSession, tx_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transaction CSVs (S1/S2)."""
    reader = (
        spark.readStream.schema(TRANSACTIONS_SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(tx_dir)


def _typed(batch: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    df = batch.select(*[F.trim(F.col(c)).alias(c) for c in batch.columns])
    typed = df.select(
        "order_id",
        F.try_to_timestamp(
            F.col("order_date_raw"), F.lit(ORDER_DATE_FORMAT)
        ).alias("order_date"),
        "product_id",
        F.col("quantity_ordered_raw").try_cast("int").alias("quantity_ordered"),
        "customer_id",
        "time_id",
    )
    return typed.filter(
        F.col("order_id").isNotNull()
        & (F.col("order_id") != "")
        & F.col("order_date").isNotNull()
        & F.col("quantity_ordered").isNotNull()
    ).dropDuplicates()  # ST4: exact-duplicate lines within the batch


def stream_etl(
    spark: SparkSession,
    tx_dir: str,
    warehouse_root: str,
    checkpoint_dir: str,
    products_master: DataFrame,
    customers_master: DataFrame,
    fact_key: tuple[str, ...] = DEFAULT_FACT_KEY,
    available_now: bool = True,
    backend: str = "manifest",
    auto_compact_segments: int | None | str = "auto",
    maintain_quarterly_agg: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the streaming ETL; with ``available_now`` it drains pending
    files and stops (test/replay mode), otherwise it runs continuously
    like the reference's ``while(true)`` consumer loop
    (src/Meshjoin.java:144-168). ``backend`` selects the
    insert-if-absent sink implementation (operators.sinks); the
    DEFAULT is the manifest backend with inline auto-compaction
    (``"auto"`` = 8 live segments) — at micro-batch cadence the plain
    parquet backend's per-batch file growth is unbounded, so
    crash-atomic bounded-segment commits are the right default for
    every foreachBatch facade, while plain parquet remains the batch-
    warehouse default (operators.etl.warehouse_for).

    ``maintain_quarterly_agg`` (manifest backend only) folds each
    batch's admitted fact rows into the incrementally-maintained
    STORE_QUARTERLY_SALES partial-sum table after the load
    (operators.etl.refresh_quarterly_agg) — the near-real-time serving
    path ``quarterly_sales_serve`` reads instead of the fact."""
    from ..operators.etl import refresh_quarterly_agg

    warehouse = warehouse_for(
        spark,
        warehouse_root,
        backend,
        resolve_auto_compact(backend, auto_compact_segments),
    )
    if maintain_quarterly_agg and backend != "manifest":
        raise ValueError(
            "maintain_quarterly_agg needs the manifest backend (the "
            f"snapshot diff drives the refresh); got {backend!r}"
        )
    stream = read_transaction_stream(spark, tx_dir, max_files_per_trigger)

    # Master data is static for the stream's lifetime (the reference
    # keeps it memory-resident, src/Meshjoin.java:22-23): materialize
    # each relation once so every micro-batch broadcasts from a pinned
    # local relation instead of re-running the master derivation
    # (parquet scan + joins) per trigger.
    products_master = products_master.localCheckpoint(eager=True)
    customers_master = customers_master.localCheckpoint(eager=True)

    # The four master dims derive solely from those static relations:
    # upsert them on the FIRST processed batch only (see
    # WarehouseOps.load_batch skip_dims) — per-batch re-upserts are
    # guaranteed no-ops that each cost an anti-join + commit. On
    # crash/replay the flag resets and the first replayed batch
    # re-upserts (no-op, insert-if-absent).
    dims_loaded = [False]

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        typed = _typed(batch)
        if typed.isEmpty():
            return
        warehouse.load_batch(
            typed,
            products_master,
            customers_master,
            fact_key,
            skip_dims=dims_loaded[0],
        )
        dims_loaded[0] = True
        if maintain_quarterly_agg:
            refresh_quarterly_agg(warehouse)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()
