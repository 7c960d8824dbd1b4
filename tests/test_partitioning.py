"""Corpus partitioning utilities: hash-sample stability under
repartitioning, distributed global ranks vs the naive window, shard
balance, and the no-global-window plan guard."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    partitioning,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)


def test_hash_sample_is_partitioning_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    a = {r.doc_id for r in partitioning.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in partitioning.hash_sample(
            docs.repartition(13), "doc_id", 0.3
        ).collect()
    }
    assert a == b and a  # same members regardless of layout
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # rate in the right ballpark


def test_hash_sample_salts_are_independent_windows(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    train = partitioning.hash_sample(docs, "doc_id", 0.5, salt="train")
    val = partitioning.hash_sample(docs, "doc_id", 0.5, salt="val")
    t = {r.doc_id for r in train.collect()}
    v = {r.doc_id for r in val.collect()}
    assert t != v  # different salts draw different members


def test_global_row_numbers_match_naive_window(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    got = partitioning.global_row_numbers(
        docs, [F.col("n").desc(), F.col("doc_id").asc()], num_partitions=7
    )
    naive = docs.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("doc_id"))) - 1,
    )
    assert {(r.doc_id, r.rn) for r in got.collect()} == {
        (r.doc_id, r.rn) for r in naive.collect()
    }


def test_global_row_numbers_plan_has_no_global_window(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    df = partitioning.global_row_numbers(docs, ["doc_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    for line in buf.getvalue().splitlines():
        if "row_number" in line:
            assert "_pid" in line, f"global window found: {line}"


def test_shard_assignments_balance(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    n_shards = 8
    out = partitioning.shard_assignments(docs, n_shards, "n_chars")
    rows = out.collect()
    assert {r.shard for r in rows} == set(range(n_shards))
    per_shard = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + r.n_chars
    # serpentine dealing: every shard's byte total within one max-doc
    # size of every other
    biggest_doc = max(r.n_chars for r in rows)
    assert max(per_shard.values()) - min(per_shard.values()) <= biggest_doc


def test_source_caps_bounds_and_prefers_largest(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    capped = partitioning.source_caps(docs, cap=5).collect()
    by_source = {}
    for r in capped:
        by_source.setdefault(r.source, []).append(r)
    full = docs.collect()
    for source, kept in by_source.items():
        assert len(kept) <= 5
        # keepers are exactly the top-5 by (n_chars desc, doc_id asc)
        want = sorted(
            (r for r in full if r.source == source),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[:5]
        assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in want)
        assert sorted(r.source_rank for r in kept) == list(range(1, len(kept) + 1))


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = partitioning.stratified_sample(docs, "lang", 10).collect()
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    per_lang = {}
    for r in got:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    for lang, n in per_lang.items():
        assert n == min(10, sizes[lang])
    again = partitioning.stratified_sample(docs.repartition(7), "lang", 10).collect()
    assert {r.doc_id for r in got} == {r.doc_id for r in again}


def test_pack_sequences_capacity_and_coverage(spark, sf_dir):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        packing,
    )

    docs = table(spark, sf_dir, "documents")
    plan = packing.pack_sequences(docs, capacity=128, n_shards=4).collect()
    assert len(plan) == docs.count()  # every doc packed exactly once
    packs = {}
    for r in plan:
        packs.setdefault(r.pack_id, []).append(r)
    for pack_id, members in packs.items():
        total = sum(r.n_tokens for r in members)
        # a pack either fits the capacity or is a single oversized doc
        assert total <= 128 or len(members) == 1
        assert sorted(r.pack_pos for r in members) == list(range(len(members)))
        # pack members all share the shard encoded in the pack id
        assert {r.shard for r in members} == {pack_id // packing.PACKS_PER_SHARD_STRIDE}
    # greedy is maximal: consecutive packs can't be merged
    for r in plan:
        assert r.n_tokens >= 0


def test_salted_source_caps_identical_to_exact(spark, sf_dir):
    """The two-stage bounded-task form must produce byte-identical
    rows AND ranks to the single-window form (the stage-1 pre-cap is
    lossless: outside a bucket's top-cap implies outside the source's
    top-cap)."""
    docs = table(spark, sf_dir, "documents")
    key = lambda r: (r.source, r.source_rank)
    exact = {key(r): r.doc_id for r in partitioning.source_caps(docs, cap=7).collect()}
    salted = {
        key(r): r.doc_id
        for r in partitioning.source_caps_salted(docs, cap=7, n_salts=5).collect()
    }
    assert exact == salted and exact


def test_pack_sequences_matches_reference_greedy(spark):
    """Randomized equivalence: the distributed packing equals an
    independent Python replay (same md5 sharding, same doc-id order,
    same greedy rule) on ragged token counts including zeros and
    oversized docs."""
    import hashlib
    import random

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        packing,
    )

    rng = random.Random(99)
    capacity, n_shards = 64, 4
    rows = []
    for doc_id in rng.sample(range(10_000), 300):
        n_tok = rng.choice([0, 1, rng.randint(2, 50), rng.randint(51, 150)])
        rows.append((doc_id, "w " * n_tok))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    by_shard = {}
    for doc_id, text in rows:
        by_shard.setdefault(md5_long(f"{doc_id}|pack") % n_shards, []).append(
            (doc_id, len(text.split()))
        )
    for shard, members in by_shard.items():
        fill, pack_idx, pos = capacity + 1, -1, 0
        for doc_id, t in sorted(members):
            if fill + t > capacity:
                pack_idx, fill, pos = pack_idx + 1, t, 0
            else:
                fill, pos = fill + t, pos + 1
            want[doc_id] = (
                shard,
                shard * packing.PACKS_PER_SHARD_STRIDE + pack_idx,
                t,
                pos,
            )

    got = {
        r.doc_id: (r.shard, r.pack_id, r.n_tokens, r.pack_pos)
        for r in packing.pack_sequences(
            docs, capacity=capacity, n_shards=n_shards
        ).collect()
    }
    assert got == want


def test_prefix_sums_keeps_fractional_values(spark):
    """Round-4 advice: a double value column must not be silently
    truncated to long by the running-sum cast."""
    df = spark.createDataFrame(
        [(i, 0.25) for i in range(8)], "id long, v double"
    )
    out = partitioning.prefix_sums(df, [F.col("id").asc()], "v", out_col="cum")
    got = {r.id: r.cum for r in out.collect()}
    assert got == {i: (i + 1) * 0.25 for i in range(8)}
    assert dict(out.dtypes)["cum"] == "double"
    # integral inputs still get an exact long running sum
    di = spark.createDataFrame([(i, 2) for i in range(8)], "id long, v int")
    outi = partitioning.prefix_sums(di, [F.col("id").asc()], "v", out_col="cum")
    assert dict(outi.dtypes)["cum"] == "bigint"
    assert {r.id: r.cum for r in outi.collect()} == {
        i: (i + 1) * 2 for i in range(8)
    }


def test_mix_plan_rejects_degenerate_weights(spark):
    """All-zero (or negative) weights raise instead of returning a
    silently empty allocation; zero-weight sources never draw docs."""
    import pytest

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(20)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="positive weight"):
        partitioning.mix_plan(docs, 10, {"src0": 0, "src1": 0})
    with pytest.raises(ValueError, match="non-negative"):
        partitioning.mix_plan(docs, 10, {"src0": -1, "src1": 2})
    out = partitioning.mix_plan(docs, 10, {"src0": 0, "src1": 1}).collect()
    assert {r.source for r in out} == {"src1"}  # weight 0 = no share
    assert len(out) == 10


def test_split_plan_is_disjoint_exhaustive_and_stable(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.partitioning import (
        split_plan,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {r.doc_id: r.split for r in split_plan(df, "doc_id", 0.1, 0.2).collect()}
    assert len(got) == 500  # exhaustive: every row gets exactly one split
    assert set(got.values()) == {"train", "val", "test"}
    # stable under repartitioning
    again = {
        r.doc_id: r.split
        for r in split_plan(df.repartition(7), "doc_id", 0.1, 0.2).collect()
    }
    assert again == got
    # a row's val/test membership equals the standalone hash samples
    # drawn from the same bucket windows (shared-draw disjointness)
    import pytest

    with pytest.raises(ValueError):
        split_plan(df, "doc_id", 0.6, 0.5)


def test_epoch_order_is_deterministic_permutation(spark):
    docs = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(60)], "doc_id long, n_chars int"
    )
    shards = partitioning.shard_assignments(docs, 4, size_col="n_chars")
    e1 = partitioning.epoch_order(shards, epoch=1)
    e1b = partitioning.epoch_order(shards, epoch=1)
    e2 = partitioning.epoch_order(shards, epoch=2)
    rows1 = {(r["doc_id"]): (r["shard"], r["position"]) for r in e1.collect()}
    rows1b = {(r["doc_id"]): (r["shard"], r["position"]) for r in e1b.collect()}
    rows2 = {(r["doc_id"]): (r["shard"], r["position"]) for r in e2.collect()}
    assert rows1 == rows1b  # same epoch: bit-identical re-run
    # placement never changes across epochs; order does
    assert {d: s for d, (s, _) in rows1.items()} == {
        d: s for d, (s, _) in rows2.items()
    }
    assert rows1 != rows2  # a different epoch is a different permutation
    # positions are contiguous 0..len-1 within every shard
    from collections import defaultdict

    per_shard = defaultdict(list)
    for _, (s, p) in rows1.items():
        per_shard[s].append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_epoch_order_plan_has_no_global_window(spark):
    from tests.test_plan_quality import plan_of

    docs = spark.createDataFrame(
        [(i, 10) for i in range(20)], "doc_id long, n_chars int"
    )
    shards = partitioning.shard_assignments(docs, 4, size_col="n_chars")
    plan = plan_of(partitioning.epoch_order(shards, epoch=1))
    # every Window in the plan must carry a partition spec (the
    # global_row_numbers machinery windows by _pid; epoch_order by
    # shard) — no single-task global sort anywhere
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), plan


def test_temperature_mix_flattens_toward_small_sources(spark):
    # head source 900 docs, tail 100: proportional gives tail 10%,
    # sqrt-temperature gives 10/(30+10) = 25% of the budget
    rows = [(i, "head") for i in range(900)] + [
        (1000 + i, "tail") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = partitioning.temperature_mix_plan(docs, budget_docs=100)
    alloc = {
        r["source"]: r["source_alloc"]
        for r in out.select("source", "source_alloc").distinct().collect()
    }
    assert sum(alloc.values()) == 100
    assert alloc["tail"] == 25 and alloc["head"] == 75
    # deterministic draw: identical on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in partitioning.temperature_mix_plan(
            docs, budget_docs=100
        ).collect()
    )
    assert a == b
