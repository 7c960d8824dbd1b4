"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline (exact; at scale
it is a broadcast of the query set against a full scan — no shuffle,
linear in corpus size). The LSH-bucketed variant bounds the candidate
set per query for corpus×corpus workloads.

Determinism contract: embeddings are scaled to integer micro-units
(round(x * 1e6) as BIGINT) so dot products and squared norms are exact
integers; cosine = dot / (sqrt(na) * sqrt(nb)) is then the identical
double on every engine, making the DuckDB oracle exact (no tolerance).
Scaling to 1e6 keeps 64-dim dot products < 2^47 — far inside BIGINT.
The ~1e-6 relative quantization error is irrelevant for ranking (ranks
are tie-broken by id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long

SCALE = 1_000_000


def scaled_vectors(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, q: array<bigint>, norm_sq: bigint) with integer micro-unit
    components."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * SCALE, 0).cast("long"),
    )
    out = emb.select(F.col(id_col), q.alias("q"))
    norm_sq = F.aggregate(
        F.transform("q", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return out.withColumn("norm_sq", norm_sq)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``num_queries`` ids.

    Plan shape: broadcast(query vectors) ⋈ full scan — one pass over
    the corpus, partial top-k per partition via the rank filter after a
    single shuffle on query_id (k·|Q| rows survive). At 100 TB the scan
    dominates; there is no corpus×corpus blow-up.
    """
    v = scaled_vectors(emb, vec_col, id_col)
    queries = v.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm_sq").alias("qn"),
    )
    cos = _dot(F.col("qq"), F.col("q")) / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm_sq").cast("double"))
    )
    scored = (
        v.join(F.broadcast(queries), F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_buckets(
    emb: DataFrame,
    num_planes: int = 6,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-random-projection (hyperplane LSH) buckets, one per hash
    table: rows (id, table_id, bucket, q, norm_sq).

    Table t / plane p's pseudo-random direction has component
    r[t·P+p][i] = +1 if md5_long(g||'|'||i) is odd else -1 (g the
    global plane index) — deterministic, identical in the DuckDB
    oracle, and never materialized: the projection sum_i(r·v_i) folds
    into the explode/groupBy. bucket = sum_p(2^p · [proj_p > 0]).

    Multiple independent tables are the standard recall lever
    (band-OR): a close pair collides in ≥1 of L tables with prob
    1-(1-p^P)^L. Scale: narrow explode (dim × L·P rows per vector)
    then one groupBy — no corpus×corpus anything.
    """
    v = scaled_vectors(emb, vec_col, id_col)
    total = num_planes * num_tables
    elem = v.select(id_col, F.posexplode("q").alias("i", "val"))
    planes = elem.select(
        id_col,
        "i",
        "val",
        F.explode(F.sequence(F.lit(0), F.lit(total - 1))).alias("g"),
    )
    sign = F.when(
        md5_long(
            F.concat(F.col("g").cast("string"), F.lit("|"), F.col("i").cast("string"))
        )
        % 2
        == 1,
        1,
    ).otherwise(-1)
    proj = (
        planes.withColumn("term", sign * F.col("val"))
        .groupBy(id_col, "g")
        .agg(F.sum("term").alias("proj"))
        .withColumn("table_id", (F.col("g") / num_planes).cast("int"))
        .withColumn("p", F.col("g") % num_planes)
    )
    bucket = F.sum(
        F.when(F.col("proj") > 0, F.pow(F.lit(2), F.col("p")).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    )
    return (
        proj.groupBy(id_col, "table_id")
        .agg(bucket.alias("bucket"))
        .join(v, id_col)
    )


def ann_lsh_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    num_planes: int = 6,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table
    hyperplane-LSH — the bucket-join scale path next to the exact
    ``cosine_topk`` baseline.

    Candidates are vectors sharing the query's bucket in ANY of the
    ``num_tables`` hash tables (band-OR), so the join is key-bounded
    (equi-join on (table_id, bucket)) instead of a full scan per
    query; candidate pairs are deduped across tables, then exact
    cosine is computed and ranked. Recall tunes with
    (num_planes ↓, num_tables ↑); cost with the opposite.
    """
    b = hyperplane_buckets(emb, num_planes, num_tables, vec_col, id_col)
    queries = b.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), "table_id", "bucket"
    )
    cand = (
        b.select(id_col, "table_id", "bucket")
        .join(F.broadcast(queries), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    v = scaled_vectors(emb, vec_col, id_col)
    qv = F.broadcast(
        v.filter(F.col(id_col) < num_queries).select(
            F.col(id_col).alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("qn"),
        )
    )
    cos = _dot(F.col("qq"), F.col("q")) / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm_sq").cast("double"))
    )
    scored = (
        cand.join(qv, "query_id")
        .join(v.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assignments(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its best
    centroid by cosine (ties break on centroid id).

    Centroids are a deterministic subset of the corpus (the first
    ``n_centroids`` ids) — the seeding step of k-means|| without the
    iterations, which keeps the operator reproducible and
    oracle-checkable; production would plug trained centroids into the
    same plan. Assignment is a broadcast of the centroid set against
    one corpus scan — no shuffle until the tiny groupBy."""
    v = scaled_vectors(emb, vec_col, id_col)
    cents = F.broadcast(
        v.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col("q").alias("cq"),
            F.col("norm_sq").alias("cn"),
        )
    )
    cos = _dot(F.col("q"), F.col("cq")) / (
        F.sqrt(F.col("norm_sq").cast("double")) * F.sqrt(F.col("cn").cast("double"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        v.crossJoin(cents)
        .withColumn("ccos", cos)
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select(id_col, "q", "norm_sq", F.col("centroid_id").alias("cell"))
    )


def ann_ivf_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF inverted index —
    the cell-partitioned scale path beside the hyperplane-LSH one.

    Each query scans only the ``n_probe`` cells whose centroids are
    closest to it (~n_probe/n_centroids of the corpus) instead of the
    full scan of ``cosine_topk``; exact cosine is computed inside the
    probed cells. Recall/cost tunes with (n_centroids, n_probe). The
    candidate join is a key-bounded equi-join on ``cell``.
    """
    assigned = ivf_assignments(emb, n_centroids, vec_col, id_col)
    v = scaled_vectors(emb, vec_col, id_col)
    qv = v.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm_sq").alias("qn"),
    )
    cents = F.broadcast(
        v.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col("q").alias("cq"),
            F.col("norm_sq").alias("cn"),
        )
    )
    qcos = _dot(F.col("qq"), F.col("cq")) / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double"))
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("centroid_id")
    )
    probes = (
        qv.crossJoin(cents)
        .withColumn("qcos", qcos)
        .withColumn("prank", F.row_number().over(wprobe))
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "qq", "qn", F.col("centroid_id").alias("cell"))
    )
    cos = _dot(F.col("qq"), F.col("q")) / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm_sq").cast("double"))
    )
    scored = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 2048,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection, executed as a distributed block matrix product.

    Vectors are tiled into id-range blocks; each block-pair (ba <= bb)
    becomes one cogrouped-``applyInPandas`` task computing the tile's
    dot products with a single int64 numpy GEMM — ~100× the per-row
    array-lambda throughput, still exact integer math (micro-unit
    components keep every dot < 2^47; see module docstring), and the
    cosine expression evaluates in the identical IEEE order as the
    column formula, so results are bit-equal to the naive join and the
    DuckDB oracle is unchanged.

    Scale shape: row inflation is O(#blocks) copies of the corpus —
    the unavoidable cost of an EXACT all-pairs op; tasks are
    independent tiles (no shuffle after the block join). At 100 TB one
    bounds candidates first with hyperplane LSH
    (``hyperplane_buckets``) and runs this GEMM per bucket.
    """
    import numpy as np
    import pandas as pd

    v = scaled_vectors(emb, vec_col, id_col).select(
        F.col(id_col).alias("vid"), "q", "norm_sq"
    )
    v = v.withColumn("blk", F.floor(F.col("vid") / block_size).cast("long"))
    blks = v.select("blk").distinct()
    pairs = (
        blks.alias("x")
        .join(blks.alias("y"), F.col("x.blk") <= F.col("y.blk"))
        .select(F.col("x.blk").alias("ba"), F.col("y.blk").alias("bb"))
    )
    left = (
        v.alias("l")
        .join(F.broadcast(pairs.alias("pl")), F.col("l.blk") == F.col("pl.ba"))
        .select("pl.ba", "pl.bb", "l.vid", "l.q", "l.norm_sq")
    )
    # distinct column names (fresh expr ids) keep the left/right
    # cogroup free of self-join ambiguity
    right = (
        v.alias("r")
        .join(F.broadcast(pairs.alias("pr")), F.col("r.blk") == F.col("pr.bb"))
        .select(
            F.col("pr.ba").alias("rba"),
            F.col("pr.bb").alias("rbb"),
            F.col("r.vid").alias("rvid"),
            F.col("r.q").alias("rq"),
            F.col("r.norm_sq").alias("rnorm_sq"),
        )
    )

    def gemm(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        if lpdf.empty or rpdf.empty:
            return empty
        A = np.array([np.asarray(x, dtype=np.int64) for x in lpdf["q"]])
        B = np.array([np.asarray(x, dtype=np.int64) for x in rpdf["rq"]])
        dots = A @ B.T  # exact int64
        na = np.sqrt(lpdf["norm_sq"].to_numpy(dtype=np.float64))
        nb = np.sqrt(rpdf["rnorm_sq"].to_numpy(dtype=np.float64))
        # same association order as the column formula: dot / (√na·√nb)
        cos = dots / (na[:, None] * nb[None, :])
        ia = lpdf["vid"].to_numpy()
        ib = rpdf["rvid"].to_numpy()
        keep = (cos >= threshold) & (ia[:, None] < ib[None, :])
        ii, jj = np.nonzero(keep)
        return pd.DataFrame(
            {"vec_a": ia[ii], "vec_b": ib[jj], "cosine": cos[ii, jj]}
        )

    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("rba", "rbb"))
        .applyInPandas(gemm, "vec_a long, vec_b long, cosine double")
    )
