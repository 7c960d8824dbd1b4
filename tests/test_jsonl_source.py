"""JSONL corpus source: good/quarantine split, roundtrip, streaming
twin feeding the curation funnel."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.jsonl import (
    read_documents_jsonl,
    stream_documents_jsonl,
    write_documents_jsonl,
)


def _write_lines(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _doc(i, text):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "source": "a", "n_chars": len(text)}
    )


def test_good_and_quarantine_split(spark, tmp_path):
    path = _write_lines(
        tmp_path,
        "docs.jsonl",
        [
            _doc(1, "hello world"),
            '{"doc_id": "not-a-number", "text": "bad type"}',
            "{truncated",
            _doc(2, "second doc"),
        ],
    )
    good, quarantined = read_documents_jsonl(spark, path)
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == {1: "hello world", 2: "second doc"}
    bad = [r["_corrupt_record"] for r in quarantined.collect()]
    assert len(bad) == 2
    assert any("not-a-number" in b for b in bad)
    assert any(b.startswith("{truncated") for b in bad)


def test_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "out")
    write_documents_jsonl(docs, out)
    good, quarantined = read_documents_jsonl(spark, out)
    assert quarantined.count() == 0
    assert good.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "text").collect()}
    b = {tuple(r) for r in good.select("doc_id", "text").collect()}
    assert a == b


def test_streaming_jsonl_feeds_funnel(spark, tmp_path):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming import (
        corpus as sc,
    )

    base = "the quick brown fox jumps over the lazy dog and then it sat"
    src = tmp_path / "stream_src"
    src.mkdir()
    _write_lines(src, "a.jsonl", [_doc(1, base), "{broken"])
    stream = stream_documents_jsonl(spark, str(src))
    assert stream.isStreaming
    seen = []

    def process(batch, _bid):
        eval_docs = batch.filter("doc_id = -1")
        kept = sc.curate_batch(
            batch.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record"
            ),
            eval_docs,
        )
        seen.extend(r["doc_id"] for r in kept.collect())

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen == [1]
