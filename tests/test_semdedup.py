"""SemDeDup behavior tests: crafted embedding groups with known
cluster structure (the driver's oracle gate covers corpus-scale
parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    similarity,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_groups_collapse_and_keep_farthest(spark):
    # two tight direction groups far apart; ids 0/1 seed the two cells
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.98, 0.02, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.01, 0.99, 0.0, 0.0]),
    ]
    out = similarity.semdedup(_emb(spark, rows), k=2, iters=2, threshold=0.9)
    got = {r["vec_id"]: r for r in out.collect()}
    assert len(got) == 5
    # each group is one component
    comp_a = {got[i]["component"] for i in (0, 2, 3)}
    comp_b = {got[i]["component"] for i in (1, 4)}
    assert len(comp_a) == 1 and len(comp_b) == 1 and comp_a != comp_b
    # exactly one keeper per component
    assert sum(got[i]["is_keeper"] for i in got) == 2
    # the keeper is the component member farthest from its centroid
    cells = {
        r["vec_id"]: r["dist_sq"]
        for r in similarity.kmeans_cells(
            _emb(spark, rows), k=2, iters=2
        ).collect()
    }
    for members in ((0, 2, 3), (1, 4)):
        keeper = {got[i]["keeper_vec_id"] for i in members}
        assert len(keeper) == 1
        expect = max(members, key=lambda i: (cells[i], -i))
        assert keeper == {expect}


def test_singletons_keep_themselves(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = similarity.semdedup(_emb(spark, rows), k=2, iters=1, threshold=0.99)
    for r in out.collect():
        assert r["is_keeper"] and r["keeper_vec_id"] == r["vec_id"]


def test_two_clone_families_one_keeper_each(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # clone of 0, same cell -> cut
        (3, [0.0, 1.0, 0.0, 0.0]),  # clone of 1, same cell -> cut
    ]
    out = similarity.semdedup(_emb(spark, rows), k=2, iters=2, threshold=0.99)
    got = {r["vec_id"]: r for r in out.collect()}
    assert got[0]["component"] == got[2]["component"]
    assert got[1]["component"] == got[3]["component"]
    assert got[0]["component"] != got[1]["component"]
    keepers = out.filter("is_keeper").count()
    assert keepers == 2


def test_big_cell_tiling_path_identical(spark):
    # degenerate corpus: every vector in the same direction -> one
    # k-means cell holds everything; force the tiling path with a
    # tiny max_cell_rows/block_size and compare against the
    # single-task path
    rows = [
        (i, [1.0, 0.001 * (i % 5), 0.0, 0.0]) for i in range(40)
    ]
    df = _emb(spark, rows)
    kw = dict(k=2, iters=1, threshold=0.999)
    base = {tuple(r) for r in similarity.semdedup(df, **kw).collect()}
    tiled = {
        tuple(r)
        for r in similarity.semdedup(
            df, **kw, max_cell_rows=8, block_size=4
        ).collect()
    }
    assert base == tiled
    # the degenerate cell really did exceed the bound (guard engaged)
    cells = similarity.kmeans_cells(df, k=2, iters=1).collect()
    from collections import Counter

    assert max(Counter(r["cell"] for r in cells).values()) > 8
