"""Streaming metrics listener: per-batch progress rows land in the
JSONL feed, including the ETL's observe() counters."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.monitor import (
    attach_metrics,
)


def _wait_for(pred, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.3)
    return False


def test_listener_records_batches_and_observed_metrics(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.json").write_text(
            "\n".join(json.dumps({"v": i * 10 + j}) for j in range(5)) + "\n"
        )
    out = str(tmp_path / "metrics.jsonl")
    listener = attach_metrics(spark, out)
    try:
        stream = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        observed = stream.observe(
            "batch_stats", F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum")
        )

        def process(batch, bid):
            batch.count()

        q = (
            observed.writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously on the driver
        assert _wait_for(
            lambda: sum(r["num_input_rows"] for r in listener.rows) >= 15
            and all(r.get("observed") for r in listener.rows)
        ), listener.rows
        assert len(listener.rows) == 3  # one per micro-batch
        assert {r["batch_id"] for r in listener.rows} == {0, 1, 2}
        obs = [r["observed"]["batch_stats"] for r in listener.rows]
        assert sorted(o["n"] for o in obs) == [5, 5, 5]
        assert sum(o["v_sum"] for o in obs) == sum(
            i * 10 + j for i in range(3) for j in range(5)
        )
        with open(out) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        assert len(lines) == len(listener.rows)
    finally:
        spark.streams.removeListener(listener)
