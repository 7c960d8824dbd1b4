"""Physical-strategy equivalence: the tiled block-GEMM paths must
produce the same rows as their naive/sparse twins — including with
MULTIPLE blocks, a path the sf0.01 driver gate (single tile) never
exercises."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    dedup,
    similarity,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted((tuple(r[c] for c in cols) for r in df.collect()), key=repr)


def test_neardup_gemm_tiling_invariant(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    one_tile = similarity.cosine_neardup_pairs(emb, block_size=1_000_000)
    many_tiles = similarity.cosine_neardup_pairs(emb, block_size=16)
    assert _rows(one_tile) == _rows(many_tiles)
    assert len(_rows(one_tile)) > 0


def test_jaccard_strategies_agree(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    gemm = dedup.jaccard_similar_pairs(docs, strategy="block_gemm")
    join = dedup.jaccard_similar_pairs(docs, strategy="shingle_join")
    assert _rows(gemm) == _rows(join)
    assert len(_rows(gemm)) > 0


def test_jaccard_gemm_tiling_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    one_tile = dedup._jaccard_block_gemm(docs, 5, 0.5, "text", "doc_id",
                                         block_size=1_000_000)
    many_tiles = dedup._jaccard_block_gemm(docs, 5, 0.5, "text", "doc_id",
                                           block_size=37)
    assert _rows(one_tile) == _rows(many_tiles)


def test_dense_ids_are_dense_unique_and_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(200)
    # word-level vocabulary — much larger than the char-5-gram charset
    from pyspark.sql import functions as F

    words = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("w"))
    ids = dedup.dense_ids(words, "w", "sid")
    rows = ids.collect()
    got = sorted(r.sid for r in rows)
    assert got == list(range(len(rows)))  # dense 0..N-1, no dupes
    again = {(r.w, r.sid) for r in dedup.dense_ids(words, "w", "sid").collect()}
    assert {(r.w, r.sid) for r in rows} == again  # deterministic


def test_block_gemm_has_no_global_window(spark, sf_dir):
    """The shingle-dictionary numbering must never funnel the vocab
    through a single-partition global window (regression: a
    row_number() over Window.orderBy(shingle))."""
    import contextlib
    import io

    docs = table(spark, sf_dir, "documents")
    df = dedup._jaccard_block_gemm(docs, 5, 0.5, "text", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "row_number" in line:
            assert "_pid" in line, f"global window found: {line}"


def test_minhash_verified_pairs_subset_of_exact(spark, sf_dir):
    """The probabilistic ladder (banding -> exact verification) must
    have EXACT precision: every emitted pair is a true >=threshold
    pair with the same jaccard value the all-pairs operator computes.
    Recall is banding-bounded, so subset — not equality."""
    docs = table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_similar_pairs(docs).collect()
    }
    ladder = dedup.minhash_verified_pairs(docs).collect()
    assert len(ladder) > 0
    for r in ladder:
        assert (r.doc_a, r.doc_b) in exact
        assert r.jaccard == exact[(r.doc_a, r.doc_b)]


def test_minhash_ladder_finds_identical_docs_deterministically(spark):
    """J=1 pairs agree on every minhash, hence collide in every band:
    recall for exact duplicates is 1, not probabilistic."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different document about spark plans"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b) for r in dedup.minhash_verified_pairs(docs).collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)


def test_lsh_banding_generalizes_band_size(spark, sf_dir):
    """band_size=4 buckets are strictly coarser than band_size=2 on
    the same 16-hash signature: every 4-wide band agreement implies
    both its 2-wide halves agree."""
    docs = table(spark, sf_dir, "documents").limit(120)
    wide = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, num_hashes=16, band_size=4).collect()
    }
    narrow = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, num_hashes=16, band_size=2).collect()
    }
    assert wide <= narrow


def test_auto_strategy_is_size_aware():
    # dense overlap on a small corpus -> GEMM is affordable
    assert dedup._pick_jaccard_strategy(avg_df=20.0, est_docs=1_000) == "block_gemm"
    # sparse overlap -> prefix-filtered join
    assert dedup._pick_jaccard_strategy(avg_df=2.0, est_docs=1_000) == "shingle_join"
    # huge corpus -> block replication forbids GEMM at ANY density
    assert (
        dedup._pick_jaccard_strategy(avg_df=50.0, est_docs=10_000_000)
        == "shingle_join"
    )
