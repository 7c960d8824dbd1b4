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


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection.

    This is the exact corpus×corpus baseline; at 100 TB one uses the
    SimHash-style hyperplane LSH to bucket candidates first (see
    dedup.simhash_fingerprints applied to sign patterns), keeping the
    join key-bounded. Kept exact here because the oracle must be exact.
    """
    v = scaled_vectors(emb, vec_col, id_col)
    a = v.select(
        F.col(id_col).alias("vec_a"), F.col("q").alias("qa"), F.col("norm_sq").alias("na")
    )
    b = v.select(
        F.col(id_col).alias("vec_b"), F.col("q").alias("qb"), F.col("norm_sq").alias("nb")
    )
    cos = _dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
