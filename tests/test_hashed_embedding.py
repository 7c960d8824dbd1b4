"""Feature-hashed text embeddings (hashing trick) and the exact
cosine k-NN graph.

The hashed sketch is the text-only on-ramp into the embedding-space
operators (near-dup, kNN, k-means, SemDeDup) for corpora with no
model-produced embedding column; the kNN graph is the exact all-pairs
baseline the approximate neighbor structures are judged against."""

from __future__ import annotations

import hashlib

import numpy as np

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    similarity,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
    HASH_EMBED_DIM,
    hashed_embedding_components,
    hashed_embedding_vectors,
)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected_sketch(text: str, dim: int = HASH_EMBED_DIM) -> dict[int, int]:
    out: dict[int, int] = {}
    for tok in text.lower().strip().split():
        b = _md5_long("e|" + tok) % dim
        s = 1 if _md5_long("s|" + tok) % 2 == 0 else -1
        out[b] = out.get(b, 0) + s
    return {b: v for b, v in out.items() if v != 0}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- sparse components


def test_components_match_reference_hash(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "pack my box with five dozen liquor jugs",
        3: "THE QUICK brown FOX",  # case-folded before hashing
    }
    docs = _docs(spark, list(texts.items()))
    got = {
        (r["doc_id"], r["bucket"]): r["val"]
        for r in hashed_embedding_components(docs).collect()
    }
    want = {
        (d, b): v for d, t in texts.items() for b, v in _expected_sketch(t).items()
    }
    assert got == want


def test_components_drop_exact_cancellations(spark):
    # find two tokens with the same bucket and opposite signs, repeat
    # them equally often -> their bucket cancels to 0 and is dropped
    pos = next(
        w
        for i in range(10_000)
        for w in [f"w{i}"]
        if _md5_long("s|" + w) % 2 == 0
    )
    bucket = _md5_long("e|" + pos) % HASH_EMBED_DIM
    neg = next(
        w
        for i in range(100_000)
        for w in [f"n{i}"]
        if _md5_long("s|" + w) % 2 == 1
        and _md5_long("e|" + w) % HASH_EMBED_DIM == bucket
    )
    docs = _docs(spark, [(1, f"{pos} {neg} {pos} {neg}")])
    assert hashed_embedding_components(docs).collect() == []


def test_tokenless_doc_contributes_no_components_but_a_zero_vector(spark):
    docs = _docs(spark, [(1, "   "), (2, "hello world")])
    comp = hashed_embedding_components(docs)
    assert {r["doc_id"] for r in comp.collect()} == {2}
    vecs = {r["vec_id"]: r["embedding"] for r in
            hashed_embedding_vectors(docs).collect()}
    assert set(vecs) == {1, 2}
    assert vecs[1] == [0.0] * HASH_EMBED_DIM
    assert any(x != 0.0 for x in vecs[2])


# ------------------------------------------------- dense vectors


def test_dense_vector_agrees_with_sparse_components(spark):
    docs = _docs(
        spark,
        [(7, "alpha beta gamma alpha alpha"), (8, "delta epsilon zeta")],
    )
    comp = {
        (r["doc_id"], r["bucket"]): r["val"]
        for r in hashed_embedding_components(docs).collect()
    }
    for r in hashed_embedding_vectors(docs).collect():
        for b, x in enumerate(r["embedding"]):
            assert x == float(comp.get((r["vec_id"], b), 0))
            assert x == int(x)  # integer-valued doubles


def test_identical_texts_hash_to_identical_vectors_cosine_one(spark):
    docs = _docs(spark, [(1, "same text here"), (2, "same text here"),
                         (3, "entirely different words appear")])
    vecs = hashed_embedding_vectors(docs)
    pairs = similarity.cosine_neardup_pairs(
        vecs, threshold=0.999, vec_scale=1
    ).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in pairs] == [(1, 2)]
    # dot/(√n·√n) of identical vectors is 1 up to one ulp of the
    # float sqrt product (e.g. 3/(√3·√3) = 1.0000000000000002)
    assert abs(pairs[0]["cosine"] - 1.0) < 1e-12


# ------------------------------------------------- kNN graph


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_knn_graph_matches_numpy_bruteforce(spark):
    rng = np.random.default_rng(42)
    n, d, k = 40, 8, 3
    V = rng.integers(-5, 6, size=(n, d)).astype(np.float64)
    V[V.sum(axis=1) == 0, 0] += 1  # keep norms nonzero
    emb = _emb(spark, [(i, [float(x) for x in V[i]]) for i in range(n)])
    got = {
        (r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.knn_graph(emb, k=k, block_size=16).collect()
    }
    # brute force under the same total order (cosine desc, id asc)
    q = np.round(V * similarity.SCALE).astype(np.int64)
    norms = np.sqrt((q * q).sum(axis=1).astype(np.float64))
    want = {}
    for i in range(n):
        cos = (q @ q[i]).astype(np.float64) / (norms * norms[i])
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-cos[j], j),
        )[:k]
        for rnk, j in enumerate(order, start=1):
            want[(i, rnk)] = (j, cos[j])
    assert set(got) == set(want)
    for key, (j, c) in want.items():
        gj, gc = got[key]
        assert gj == j
        assert abs(gc - c) < 1e-12


def test_knn_graph_is_directed(spark):
    # b's nearest is a, but a's k=1 nearest is a2 (a's near-twin):
    # a in knn(b) while b not in knn(a) — the graph must be directed
    emb = _emb(
        spark,
        [
            (1, [10.0, 0.0]),
            (2, [10.0, 1.0]),
            (3, [7.0, 7.0]),
        ],
    )
    g = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.knn_graph(emb, k=1, block_size=2).collect()
    }
    assert g[3] == 2  # 45° vector leans toward (10,1)
    assert g[1] == 2 and g[2] == 1


def test_knn_graph_excludes_zero_vectors_both_sides(spark):
    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
    )
    rows = similarity.knn_graph(emb, k=2, block_size=2).collect()
    assert all(r["vec_id"] != 3 for r in rows)  # no NaN sources
    assert all(r["neighbor_id"] != 3 for r in rows)  # no NaN neighbors
    # remaining vectors still rank each other
    assert {(r["vec_id"], r["neighbor_id"]) for r in rows} == {(1, 2), (2, 1)}


def test_knn_graph_tie_broken_by_neighbor_id(spark):
    # 2 and 3 are identical -> equal cosine to 1; lower id ranks first
    emb = _emb(
        spark,
        [(1, [1.0, 1.0]), (2, [2.0, 0.0]), (3, [2.0, 0.0])],
    )
    rows = sorted(
        (r["rnk"], r["neighbor_id"])
        for r in similarity.knn_graph(emb, k=2, block_size=2).collect()
        if r["vec_id"] == 1
    )
    assert rows == [(1, 2), (2, 3)]


# ------------------------------------------------- IVF kNN graph


def test_kmeans_probe_1_equals_argmin_assign(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.similarity import (
        _kmeans_assign,
        _kmeans_iterate,
        _kmeans_probe,
        scaled_vectors,
    )

    rng = np.random.default_rng(7)
    emb = _emb(
        spark,
        [(i, [float(x) for x in rng.integers(-5, 6, 8)]) for i in range(30)],
    )
    v = scaled_vectors(emb).select("vec_id", "q")
    cents = _kmeans_iterate(v, 4, 2, "vec_id")
    argmin = {
        r["vec_id"]: r["cell"]
        for r in _kmeans_assign(v, cents, "vec_id").collect()
    }
    probed1 = {
        r["vec_id"]: r["cell"]
        for r in _kmeans_probe(v, cents, "vec_id", 1).collect()
    }
    assert probed1 == argmin


def test_knn_graph_ivf_single_cell_equals_exact(spark):
    # n_centroids=1: every vector is member of and probes the one
    # cell, so the "approximate" graph IS the exact graph
    rng = np.random.default_rng(11)
    emb = _emb(
        spark,
        [(i, [float(x) for x in rng.integers(-5, 6, 8)]) for i in range(25)],
    )
    exact = {
        (r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.knn_graph(emb, k=3, block_size=8).collect()
    }
    ivf = {
        (r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.knn_graph_ivf(
            emb, k=3, n_centroids=1, n_probe=1, block_size=8
        ).collect()
    }
    assert ivf == exact


def test_knn_graph_ivf_blocking_invariant_and_probe_monotone(spark):
    rng = np.random.default_rng(13)
    emb = _emb(
        spark,
        [(i, [float(x) for x in rng.integers(-5, 6, 8)]) for i in range(40)],
    )
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.knn_graph(emb, k=3, block_size=16).collect()
    }

    def edges(n_probe, block_size):
        return {
            (r["vec_id"], r["neighbor_id"])
            for r in similarity.knn_graph_ivf(
                emb, k=3, n_centroids=4, n_probe=n_probe,
                block_size=block_size,
            ).collect()
        }

    # tiny blocks vs one block per cell: identical edge set
    assert edges(2, 4) == edges(2, 64)
    # recall is monotone in n_probe, and probing ALL cells recovers
    # the exact graph
    r1 = len(edges(1, 64) & exact)
    r2 = len(edges(2, 64) & exact)
    assert r1 <= r2
    assert edges(4, 64) == exact


# ------------------------------------------------- mutual-kNN clusters


def test_knn_clusters_mutuality_blocks_hub_chaining(spark):
    # two tight pairs + a hub equidistant-ish between them: the hub's
    # edges are one-sided (pair members prefer each other), so
    # mutuality keeps the pairs separate and the hub a singleton
    emb = _emb(
        spark,
        [
            (1, [10.0, 0.0]),
            (2, [10.0, 0.5]),
            (3, [0.0, 10.0]),
            (4, [0.5, 10.0]),
            (5, [7.0, 7.0]),  # hub leaning to no pair
        ],
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in similarity.knn_clusters(emb, k=1, block_size=2).collect()
    }
    assert got[1] == got[2] == 1
    assert got[3] == got[4] == 3
    assert got[5] == 5  # singleton: no reciprocal edge at k=1


def test_knn_clusters_every_vector_labelled_zero_vec_singleton(spark):
    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 0.0])],
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in similarity.knn_clusters(emb, k=2, block_size=2).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == got[2] == 1
    assert got[3] == 3  # zero vector: NaN cosine, no edges, own label


def test_knn_clusters_transitive_chain_collapses(spark):
    # a -- b -- c chain of mutual edges at k=2 merges into one cluster
    emb = _emb(
        spark,
        [
            (10, [10.0, 0.0]),
            (11, [10.0, 1.0]),
            (12, [10.0, 2.0]),
        ],
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in similarity.knn_clusters(emb, k=2, block_size=2).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10}


def test_kmeans_seeds_any_nonempty_id_space(spark):
    # md5-ordered seeding (round 9) removed the old sparse-id hole:
    # ids all >= k used to produce an EMPTY centroid relation (and a
    # loud ValueError); now ANY non-empty corpus seeds min(n, k)
    # centroids and every vector is assigned a cell. Only an EMPTY
    # relation stays a loud error.
    import pytest

    emb = _emb(spark, [(1000 + i, [float(i), 1.0]) for i in range(6)])
    cells = similarity.kmeans_cells(emb, k=4, iters=1).collect()
    assert len(cells) == 6
    assert all(r["cell"] is not None for r in cells)
    marks = similarity.semdedup(emb, k=4, threshold=0.99).collect()
    assert len(marks) == 6
    with pytest.raises(ValueError, match="empty vector relation"):
        similarity.kmeans_cells(
            emb.filter("vec_id < 0"), k=4, iters=1
        ).collect()


def test_knn_clusters_ivf_graph_option(spark):
    import pytest

    rng = np.random.default_rng(17)
    emb = _emb(
        spark,
        [(i, [float(x) for x in rng.integers(-5, 6, 8)]) for i in range(30)],
    )
    exact = {
        (r["vec_id"], r["cluster"])
        for r in similarity.knn_clusters(emb, k=2, block_size=16).collect()
    }
    # probing ALL cells makes the ivf graph the exact graph, so the
    # clustering coincides too
    all_cells = {
        (r["vec_id"], r["cluster"])
        for r in similarity.knn_clusters(
            emb, k=2, block_size=16, graph="ivf", n_centroids=4, n_probe=4
        ).collect()
    }
    assert all_cells == exact
    # bounded probing still yields a full partition (every vector
    # labelled exactly once)
    probed = similarity.knn_clusters(
        emb, k=2, block_size=16, graph="ivf", n_centroids=4, n_probe=1
    ).collect()
    assert sorted(r["vec_id"] for r in probed) == list(range(30))
    with pytest.raises(ValueError, match="graph builder"):
        similarity.knn_clusters(emb, graph="nope").collect()
