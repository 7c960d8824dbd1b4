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
