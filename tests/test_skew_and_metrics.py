"""Salted-join equivalence, ETL observe metrics, and streaming dedup
with bounded state."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    skew,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.etl import (
    build_fact,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.csv_inputs import (
    read_customers_master,
    read_products_master,
    read_transactions,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    read_events,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.windows import (
    read_event_stream,
    streaming_deduplicate,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def test_salted_join_equals_plain_join(spark, sf_dir):
    # skewed side: lineitem keyed by suppkey (each key ~hot relative to
    # the tiny supplier side); plain join is the semantic oracle
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(supp, ["l_suppkey"])
    salted = skew.salted_join(li, supp, ["l_suppkey"], num_salts=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    plain = left.join(right, ["k"], "left")
    salted = skew.salted_join(left, right, ["k"], num_salts=3, how="left")
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_etl_observe_counts_dropped_records(spark, tmp_path):
    from .test_etl import CUSTOMERS_CSV, PRODUCTS_CSV, TRANSACTIONS_CSV

    (tmp_path / "p.csv").write_text(PRODUCTS_CSV)
    (tmp_path / "c.csv").write_text(CUSTOMERS_CSV)
    # one transaction referencing neither a known product nor customer
    orphan = "ORD9999,2019-03-02 10:00:00,P-NOPE,2,C-NOPE,T9999\n"
    (tmp_path / "t.csv").write_text(TRANSACTIONS_CSV + orphan)

    products = read_products_master(spark, str(tmp_path / "p.csv"))
    customers = read_customers_master(spark, str(tmp_path / "c.csv"))

    (tmp_path / "t_base.csv").write_text(TRANSACTIONS_CSV)
    base_obs = Observation("etl_base")
    build_fact(
        read_transactions(spark, str(tmp_path / "t_base.csv")),
        products, customers, observation=base_obs,
    ).count()

    obs = Observation("etl")
    fact = build_fact(
        read_transactions(spark, str(tmp_path / "t.csv")),
        products, customers, observation=obs,
    )
    n_fact = fact.count()
    got = obs.get
    # exactly the injected orphan is dropped on top of the baseline
    assert got["n_dropped"] == base_obs.get["n_dropped"] + 1
    assert got["n_input"] == got["n_matched"] + got["n_dropped"]
    assert n_fact <= got["n_matched"]  # dedup by order_id may reduce further


def test_streaming_dedup_bounded_state(spark, sf_dir, tmp_path):
    src = read_events(spark, sf_dir).limit(500)
    stream_dir = str(tmp_path / "events")
    src.coalesce(1).write.mode("append").parquet(stream_dir)
    # re-deliver a subset: an at-least-once source replay
    src.limit(100).coalesce(1).write.mode("append").parquet(stream_dir)

    out = streaming_deduplicate(
        read_event_stream(spark, stream_dir, max_files_per_trigger=1),
        key_cols=["event_id"],
    )
    q = (
        out.writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_stream").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)) == src.count()


def _hot_shingle_corpus(spark, n_docs=120):
    """Adversarial corpus for the prefix join: every doc is a unique
    20-char block + a shared 30-char block. Prefix size
    floor(|shingles|/2)+1 exceeds the unique-shingle count, so each
    doc's prefix is FORCED to include shared viral shingles (df =
    n_docs) — one bucket then carries O(n_docs^2) candidate pairs —
    while pairwise Jaccard stays ~0.39 < 0.5 (no output explosion).
    Docs 0 and 1 are exact clones: the one genuine near-dup pair."""
    import hashlib

    common = hashlib.md5(b"viral-common-block").hexdigest()[:30].upper()
    rows = []
    for i in range(n_docs):
        uid = "u0" if i <= 1 else f"u{i}"
        unique = hashlib.md5(uid.encode()).hexdigest()[:20]
        rows.append((i, unique + common))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_salted_prefix_join_identical_output(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        dedup,
    )

    docs = _hot_shingle_corpus(spark)
    plain = _sorted_rows(dedup._jaccard_shingle_join(docs))
    salted = _sorted_rows(dedup._jaccard_shingle_join(docs, num_salts=8))
    assert salted == plain
    pairs = {(a, b) for a, b, _ in plain}
    assert pairs == {(0, 1)}  # the planted clone pair, nothing else
    # the salted plan really joins on (shingle, _salt)
    plan = (
        dedup._jaccard_shingle_join(docs, num_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan


def test_salted_join_spreads_hot_bucket_across_tasks(spark):
    """Bounded task skew: a single viral join key lands in ONE task
    under a plain shuffle join; salting fans its candidate generation
    out across ~num_salts tasks."""
    hot = spark.createDataFrame(
        [(i, "HOTKEY") for i in range(400)], "id long, shingle string"
    )
    la = hot.select(F.col("id").alias("doc_a"), "shingle")
    rb = hot.select(F.col("id").alias("doc_b"), "shingle")

    def parts(df):
        return {
            r._pid: r.n
            for r in df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    # force a real shuffled join and keep AQE from re-coalescing the
    # (deliberately tiny) salt buckets — at cluster scale the buckets
    # are large and AQE would keep them apart on its own
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        plain = parts(la.join(rb, "shingle"))
        salted = parts(skew.salted_join(la, rb, ["shingle"], num_salts=8))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    total = 400 * 400
    assert sum(plain.values()) == sum(salted.values()) == total
    assert len(plain) == 1  # the hot bucket: one task does everything
    # 8 salt values hash into the shuffle space; a few may collide on a
    # partition, but the hot bucket must genuinely fan out
    assert len(salted) >= 4  # salting spreads it
    assert max(salted.values()) <= total / 2  # no task near the old hot spot


def test_minhash_salted_band_join_identical_output(spark):
    """Mass-duplicated corpus: every copy lands in the SAME (band, hk)
    bucket in every band — the hot-bucket case the salted fallback
    exists for. Salted output must equal the plain band join."""
    import hashlib

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        dedup,
    )

    rows = [(i, "clone text body shared by every copy here") for i in range(40)]
    rows += [
        (100 + i, hashlib.md5(f"u{i}".encode()).hexdigest() * 3)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = _sorted_rows(dedup.minhash_lsh_pairs(docs, 5, 16, 2))
    salted = _sorted_rows(
        dedup.minhash_lsh_pairs(docs, 5, 16, 2, num_salts=8)
    )
    assert salted == plain
    clone_pairs = {(a, b) for a, b in plain if a < 100 and b < 100}
    assert len(clone_pairs) == 40 * 39 // 2  # the full clone clique
    # verified ladder accepts the same knob end to end
    v_plain = _sorted_rows(dedup.minhash_verified_pairs(docs))
    v_salted = _sorted_rows(dedup.minhash_verified_pairs(docs, num_salts=8))
    assert v_plain == v_salted
    # the salted plan really joins on (band, hk, _salt)
    plan = dedup.minhash_lsh_pairs(
        docs, 5, 16, 2, num_salts=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
