"""JSONL corpus source — the interchange format crawl dumps and
training-data pipelines actually exchange (one JSON document per
line), batch and streaming, with corrupt-record quarantine.

Real ingestion never sees clean input: truncated lines, invalid
UTF-8 escapes, schema drift. Spark's PERMISSIVE mode routes anything
unparseable into ``columnNameOfCorruptRecord`` instead of failing the
job; this module splits that into a (good, quarantined) pair so the
pipeline ingests what parses and retains the rest for inspection —
the standard dead-letter pattern. FAILFAST/DROPMALFORMED are one
option away but almost never what a 100 TB crawl ingest wants.

Scale shape: the JSON reader is a plain distributed file scan (one
task per split; .jsonl.gz files are one task per FILE — prefer
many-file layouts or zstd-seekable at scale). Schema is always passed
explicitly: schema inference would scan the corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# documents-table schema plus the quarantine column (PERMISSIVE mode
# requires the corrupt column to be part of the read schema)
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows carry the document columns;
    quarantined rows carry the raw offending line in
    ``_corrupt_record``. A row parses as corrupt when the line is not
    valid JSON OR a field fails its declared type (PERMISSIVE keeps
    the other fields NULL and still captures the raw line).

    The parsed relation is lazily ``localCheckpoint``-ed: Spark
    refuses queries that reference ONLY the corrupt column of a raw
    JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and the checkpoint also makes the two sides share one physical
    scan instead of re-parsing the corpus per consumer — the same
    one-pass/two-sink shape a dead-letter ingest runs at scale.
    Quarantined rows keep every column (whatever half-parsed values
    PERMISSIVE recovered, plus the raw line) for inspection.
    """
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .localCheckpoint(eager=False)
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = raw.filter(F.col(CORRUPT_COL).isNotNull())
    return good, quarantined


def stream_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin: a file-source JSONL stream with the same
    PERMISSIVE contract — feed it to ``streaming.corpus`` funnels.
    Corrupt rows arrive with ``_corrupt_record`` set; the per-batch
    funnel drops them at the first gate (every signal is NULL), or
    callers can fork them to a dead-letter sink in foreachBatch."""
    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def write_documents_jsonl(docs: DataFrame, path: str, mode: str = "error") -> None:
    """One JSON object per line, one file per partition — the layout
    every downstream tokenizer/trainer ingests."""
    docs.write.mode(mode).json(path)
