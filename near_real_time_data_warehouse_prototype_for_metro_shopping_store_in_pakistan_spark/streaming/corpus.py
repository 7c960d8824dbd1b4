"""Near-real-time corpus curation: the LLM-data ingestion funnel as a
Structured Streaming pipeline.

Batch curation (``plans.pipeline_queries.corpus_curation_funnel``)
scores a finished corpus; a crawl never finishes, so the same funnel
has to run per micro-batch while staying globally consistent:

- **language + quality gates** are per-row column expressions
  (``text_profile.curation_flags``) — stateless, stream-ready as-is;
- **benchmark decontamination** is a broadcast-eval Arrow map
  (``dedup.ngram_decontaminate``) — stateless, stream-ready as-is;
- **exact dedup** is the only cross-batch concern: it becomes the
  warehouse's insert-if-absent keyed on the text fingerprint, the same
  anti-join idempotency the fact sink uses (SURVEY ST3) — the FIRST
  arrival of a text survives, every later duplicate (same batch or any
  later batch, including crash replays) is filtered by key.

State is therefore exactly the curated table itself — no streaming
dedup state to watermark, and replays are naturally idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import broadcast_eval_grams, ngram_decontaminate
from ..operators.etl import ParquetWarehouse
from ..operators.text_profile import curation_flags

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CURATED_TABLE = "curated_docs"
QUALITY_MIN = 100


def curate_batch(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    quality_min: int = QUALITY_MIN,
    eval_state=None,
) -> DataFrame:
    """One batch through the gates (language, quality, decontamination)
    — everything except the cross-batch dedup, which the sink owns.
    Returns the surviving docs with their fingerprints. Pass a
    prepared ``eval_state`` (``dedup.broadcast_eval_grams``) when
    calling per micro-batch so the static eval set is collected and
    broadcast exactly once for the stream's lifetime."""
    flags = curation_flags(docs).filter(
        F.col("lang_ok") & (F.col("quality_score") >= quality_min)
    )
    decont = ngram_decontaminate(
        docs, eval_docs, eval_state=eval_state
    ).filter(~F.col("contaminated"))
    return (
        docs.join(flags.select("doc_id", "quality_score", "text_fp"), "doc_id")
        .join(decont.select("doc_id", "is_eval"), "doc_id")
        .filter(~F.col("is_eval"))
        .select("doc_id", "text_fp", "quality_score", "text", "lang", "source")
    )


def stream_curate(
    spark: SparkSession,
    docs_dir: str,
    corpus_root: str,
    checkpoint_dir: str,
    eval_docs: DataFrame,
    quality_min: int = QUALITY_MIN,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream document files through the curation funnel into an
    idempotent curated-corpus table keyed on the text fingerprint."""
    warehouse = ParquetWarehouse(
        spark, corpus_root, keys={CURATED_TABLE: ["text_fp"]}, partitioning={}
    )
    # the eval set is static for the stream's lifetime: collect and
    # broadcast it ONCE here, not per trigger
    eval_state = broadcast_eval_grams(eval_docs)
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(docs_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        kept = curate_batch(batch, quality_min=quality_min, eval_state=eval_state)
        # in-batch first-arrival (min doc_id) per fingerprint; the
        # sink's anti-join handles every earlier batch and replays
        from pyspark.sql import Window

        w = Window.partitionBy("text_fp").orderBy("doc_id")
        first = (
            kept.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        warehouse.insert_if_absent(CURATED_TABLE, first)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
