"""Streaming IVF index maintenance: the train → ingest → serve loop.

``similarity.kmeans_centroids`` trains the coarse quantizer offline;
this module keeps the inverted index CURRENT as new vectors stream in,
and serves top-k searches from the persisted index with
partition-pruned scans — the near-real-time counterpart of
``ann_ivf_topk`` (which indexes its input in-flight):

- **ingest** (``stream_index_embeddings``): per micro-batch, each
  vector is assigned to its nearest trained centroid by the broadcast
  argmax (``similarity.ivf_assignments`` — zero shuffle, zero row
  inflation) and upserted into a parquet index HIVE-PARTITIONED BY
  CELL via the warehouse's insert-if-absent anti-join. The dedup key
  (vec_id) determines the partition (cell is a pure function of the
  vector under fixed centroids), so the anti-join prunes to only the
  touched cells and replays are no-ops — the exact contract the fact
  sink has.
- **serve** (``ivf_index_topk``): per query, the ``n_probe`` closest
  cells are computed against the same broadcast centroids; the probe
  cell list (≤ queries × n_probe ints — metadata-scale) becomes a
  static ``cell IN (...)`` filter on the index scan, so Spark reads
  ONLY those cell directories (directory-level partition pruning — the
  plan's PartitionFilters, asserted by test). Quantized vectors and
  norms are stored in the index, so serving re-reads no raw
  embeddings and re-quantizes nothing.

Search results are IDENTICAL to ``ann_ivf_topk(emb,
centroids=...)`` over the same accumulated vectors (asserted
stream ≡ batch in tests): same scoring expressions, same
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.etl import ParquetWarehouse
from ..operators.similarity import (
    _centroid_array_from,
    _dot,
    ivf_assignments,
    probe_cells,
    scaled_vectors,
)

INDEX_TABLE = "ivf_index"

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def index_warehouse(spark: SparkSession, index_root: str) -> ParquetWarehouse:
    return ParquetWarehouse(
        spark,
        index_root,
        keys={INDEX_TABLE: ["vec_id"]},
        partitioning={INDEX_TABLE: ["cell"]},
    )


def stream_index_embeddings(
    spark: SparkSession,
    emb_dir: str,
    index_root: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Micro-batched IVF index ingestion against TRAINED centroids
    (``kmeans_centroids`` output: centroid_id, cq, cn)."""
    warehouse = index_warehouse(spark, index_root)
    # the trained quantizer is static for the stream's lifetime:
    # materialize the k-row relation once, not per trigger
    cent = centroids.localCheckpoint(eager=True)
    reader = spark.readStream.schema(EMBEDDINGS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(emb_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        assigned = ivf_assignments(
            batch, vec_col=vec_col, id_col=id_col, centroids=cent
        ).select(id_col, "q", "norm_sq", "cell")
        warehouse.insert_if_absent(INDEX_TABLE, assigned)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def probe_cells_for(
    queries: DataFrame, centroids: DataFrame, n_probe: int
) -> DataFrame:
    """(query_id, qq, qn, cell) — the ``n_probe`` best cells per
    query. Quantizes the queries, then delegates to the SHARED
    ``similarity.probe_cells`` (the same expressions ``ann_ivf_topk``
    probes with, so serve ≡ batch tie-breaks hold by construction)."""
    qv = scaled_vectors(queries, "embedding", "query_id").select(
        "query_id",
        F.col("q").alias("qq"),
        F.col("norm_sq").alias("qn"),
    )
    return probe_cells(qv, _centroid_array_from(centroids), n_probe)


def ivf_index_topk(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine search served from the PERSISTED cell-partitioned
    index: the probe-cell set (metadata-scale) is collected into a
    static ``cell IN (...)`` predicate so the parquet scan touches
    only the probed directories; exact cosine + row_number tie-break
    inside, identical to ``ann_ivf_topk``.

    ``queries`` is (query_id, embedding). Self-matches (an indexed
    vector queried by its own id) are excluded, as in the ANN family.
    """
    # Lazy checkpoint: the probe relation feeds BOTH the cell collect
    # below and the scoring join — without it each consumer re-runs
    # query quantization, centroid scoring, and the caller's entire
    # centroids lineage (a raw kmeans_centroids() argument would
    # re-train per consumer).
    probes = probe_cells_for(queries, centroids, n_probe).localCheckpoint(
        eager=False
    )
    # metadata-scale collect: <= |queries| * n_probe distinct ints —
    # same pattern as the fact sink's touched-partition pruning
    cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )
    index = (
        index_warehouse(spark, index_root).read(INDEX_TABLE)
    )
    if index is None:
        raise ValueError(f"no {INDEX_TABLE} under {index_root}")
    pruned = index.filter(F.col("cell").isin(cells))
    cos = _dot(F.col("qq"), F.col("q")) / (
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("norm_sq").cast("double"))
    )
    scored = pruned.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )
