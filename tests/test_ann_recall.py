"""Recall of the approximate ANN paths against the exact baseline.

The oracle gate already proves each variant computes ITS OWN
definition exactly; this measures how good the approximations are as
nearest-neighbor indexes, and pins a floor so a refactor that silently
degrades recall (e.g. a broken bucket join returning near-empty
candidate sets) fails loudly."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)

K = 5
NQ = 10


def _neighbor_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & ns) for q, ns in exact.items())
    total = sum(len(ns) for ns in exact.values())
    return hits / total


def test_ann_variants_recall(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exact = _neighbor_sets(similarity.cosine_topk(emb, NQ, K))
    lsh = _neighbor_sets(similarity.ann_lsh_topk(emb, NQ, K, num_planes=6, num_tables=4))
    ivf = _neighbor_sets(
        similarity.ann_ivf_topk(emb, NQ, K, n_centroids=16, n_probe=4)
    )
    r_lsh = _recall(lsh, exact)
    r_ivf = _recall(ivf, exact)
    # floors are deliberately loose — these are drift alarms, not SLAs
    assert r_lsh >= 0.05, f"LSH recall collapsed: {r_lsh}"
    assert r_ivf >= 0.2, f"IVF recall collapsed: {r_ivf}"
    # every query must get a full k candidates from IVF at probe=4/16
    assert all(len(ns) == K for ns in ivf.values())
