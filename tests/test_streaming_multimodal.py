"""Streaming multimodal ingestion: the Arrow-batched decode stage runs
unchanged inside a Structured Streaming pipeline (mapInPandas is
stateless, so the same operator serves batch and stream)."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    multimodal,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)


def test_streaming_decode_equals_batch(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").limit(200)
    stream_dir = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(stream_dir)

    batch_rows = sorted(
        tuple(r)
        for r in multimodal.decode_media(
            multimodal.documents_as_media(docs)
        ).collect()
    )

    stream_docs = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stream_dir)
    decoded = multimodal.decode_media(multimodal.documents_as_media(stream_docs))
    q = (
        decoded.writeStream.option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .format("memory")
        .queryName("mm_stream")
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(tuple(r) for r in spark.table("mm_stream").collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) == 200
