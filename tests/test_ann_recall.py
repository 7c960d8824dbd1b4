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


def test_ivfpq_rerank_recall_dominates_raw_adc(spark, sf_dir):
    """Two-stage exact re-rank (pq.ann_ivfpq_rerank_topk) must beat or
    match raw ADC top-k PER QUERY at equal probe settings: the ADC
    top-k is a subset of the ADC top-shortlist, and exact scoring only
    reorders candidates toward the true ranking. Also pins that the
    result set is drawn from the shortlist and that served scores are
    exact cosines (match cosine_topk's scores on shared pairs)."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import pq

    emb = table(spark, sf_dir, "embeddings")
    exact = _neighbor_sets(similarity.cosine_topk(emb, NQ, K))
    kw = dict(n_centroids=16, n_probe=4, m=4, ksub=16, iters=2)
    raw = pq.ann_ivfpq_topk(emb, NQ, K, **kw)
    rer = pq.ann_ivfpq_rerank_topk(emb, NQ, K, shortlist=4 * K, **kw)
    raw_s = _neighbor_sets(raw)
    rer_s = _neighbor_sets(rer)
    for q, ns in exact.items():
        assert len(rer_s.get(q, set()) & ns) >= len(
            raw_s.get(q, set()) & ns
        ), f"query {q}: rerank lost recall vs raw ADC"
    assert _recall(rer_s, exact) >= _recall(raw_s, exact)
    # rerank results come from the ADC shortlist
    short = _neighbor_sets(
        pq.ann_ivfpq_topk(emb, NQ, 4 * K, **kw)
    )
    for q, ns in rer_s.items():
        assert ns <= short.get(q, set())
    # served scores are exact: agree with cosine_topk on shared pairs
    true_cos = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.cosine_topk(emb, NQ, 50).collect()
    }
    for r in rer.collect():
        t = true_cos.get((r.query_id, r.neighbor_id))
        if t is not None:
            assert abs(r.cosine - t) < 1e-12
