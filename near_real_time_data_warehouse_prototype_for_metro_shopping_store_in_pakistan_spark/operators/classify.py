"""Hashed-feature linear quality classifier (fastText-style scoring).

The standard LLM-data quality gate (GPT-3/CCNet lineage) is a linear
classifier over hashed bag-of-words features: tokenize, hash each
token into one of B buckets, sum the bucket weights, threshold. The
expensive part at 100 TB is the tokenize+hash+sum — the weights are a
tiny dense vector. ``hashed_linear_score`` implements exactly that
shape with deterministic stand-in weights (md5-derived per bucket,
integer-valued so both engines agree bit-for-bit);
``weighted_linear_score`` is the LEARNED-weights form: the same plan
with the weight expression replaced by a broadcast join against an
explicit (bucket, weight) relation — the ≤B-row table a trained
fastText/logistic model exports.

Plan shape: explode tokens (narrow), compute bucket + weight as JVM
column expressions, ONE map-side-combinable groupBy(doc) aggregate —
whole-stage codegen end to end, no Python, no all-pairs, scales
linearly in corpus tokens. Docs with zero tokens survive via
``explode_outer`` with zero score.

Beyond reference parity: the reference has no classifier surface at
all; this is LLM-pipeline extension surface (SURVEY.md §2 extension
block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long, tokens

N_BUCKETS = 4096
# weight(b) = md5_long('w|' || b) % 2001 - 1000  ->  integer in
# [-1000, 1000]; md5_long is non-negative so % is portable.
WEIGHT_SPAN = 2001
WEIGHT_OFFSET = 1000
KEEP_THRESHOLD = 0


def hashed_linear_score(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score = Σ over tokens of weight(md5_long(token) % n_buckets),
    integer-exact. Returns (id_col, n_tokens, score_sum, keep) with
    keep = score_sum >= KEEP_THRESHOLD — one row per input doc.
    """
    tok = docs.select(
        id_col, F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    bucket = md5_long(F.col("tok")) % n_buckets
    weight = (
        md5_long(F.concat(F.lit("w|"), bucket.cast("string"))) % WEIGHT_SPAN
        - WEIGHT_OFFSET
    )
    scored = tok.withColumn(
        "_w", F.when(F.col("tok").isNull(), F.lit(0)).otherwise(weight)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("tok").alias("n_tokens"),
            F.sum("_w").alias("score_sum"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("score_sum").cast("long").alias("score_sum"),
            (F.col("score_sum") >= KEEP_THRESHOLD).alias("keep"),
        )
    )


def quantile_prune(
    scores: DataFrame,
    pct: int = 75,
    score_col: str = "score_sum",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality pruning by exact score quantile: keep every doc whose
    score reaches the corpus's ``pct``-th percentile — "train on the
    top quartile" as one distributed plan, the selection step that
    follows any quality classifier in an LLM-data pipeline.

    The threshold is the EXACT discrete percentile by the counting
    formulation (the same nearest-rank, integer-ceil convention as
    ``events.value_quantiles``): scores collapse to a
    (score -> count) relation first (ONE map-side-combinable
    aggregate), the cumulative rank over that relation is the
    DISTRIBUTED prefix-sum scan (``partitioning.prefix_sums``:
    range-partitioned local cumsums + broadcast partition offsets —
    no single-task ``Window.orderBy``, because per-document score
    sums have a distinct domain that grows ~O(#docs) on a natural
    corpus), and the threshold — one row — broadcasts back onto the
    corpus. No global sort of rows, no driver-side collect. Returns
    (id, score, threshold, keep) for every input row;
    ``filter(keep)`` is the pruned corpus (ties at the threshold are
    kept — deterministic, and the percentile guarantee is "at least
    pct% of rows fall at or below threshold")."""
    from .partitioning import prefix_sums

    if not 0 < pct < 100:
        raise ValueError(f"pct ({pct}) must be in 1..99")
    counts = scores.groupBy(score_col).agg(F.count(F.lit(1)).alias("_n"))
    # out_col must not collide with prefix_sums' internal "_cum"
    cum = prefix_sums(counts, [score_col], "_n", out_col="_crank")
    thr_row = F.broadcast(
        cum.crossJoin(
            F.broadcast(counts.agg(F.sum("_n").alias("_nr")))
        )
        .withColumn(
            "_thr_rank",
            F.expr(f"greatest((_nr * {pct} + 99) div 100, 1)"),
        )
        .filter(F.col("_crank") >= F.col("_thr_rank"))
        .agg(F.min(score_col).alias("threshold"))
    )
    return scores.crossJoin(thr_row).select(
        id_col,
        score_col,
        "threshold",
        (F.col(score_col) >= F.col("threshold")).alias("keep"),
    )


def weighted_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = N_BUCKETS,
    default_weight: int = 0,
    threshold: int = KEEP_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learned-weights linear classifier: score = Σ over tokens of
    ``weights[md5_long(token) % n_buckets]``, with ``default_weight``
    for buckets absent from the table (a trained model's weight
    export is typically sparse — untouched buckets mean zero).

    ``weights`` is a (bucket long, weight long) relation, ≤ n_buckets
    rows — model-sized, never corpus-sized — so it broadcasts: the
    plan is the hashed-score plan with the md5 weight expression
    swapped for one BroadcastHashJoin, still one map-side-combinable
    aggregate over the exploded tokens, still zero Python. Returns
    (id_col, n_tokens, score_sum, keep) exactly like
    ``hashed_linear_score``; integer weights keep both engines
    bit-identical."""
    tok = docs.select(
        id_col, F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    bucket = md5_long(F.col("tok")) % n_buckets
    keyed = tok.withColumn(
        "_bucket", F.when(F.col("tok").isNotNull(), bucket)
    )
    joined = keyed.join(
        F.broadcast(weights.select("bucket", "weight")),
        keyed["_bucket"] == F.col("bucket"),
        "left",
    )
    w = F.when(F.col("tok").isNull(), F.lit(0)).otherwise(
        F.coalesce(F.col("weight"), F.lit(default_weight))
    )
    return (
        joined.withColumn("_w", w)
        .groupBy(id_col)
        .agg(
            F.count("tok").alias("n_tokens"),
            F.sum("_w").alias("score_sum"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("score_sum").cast("long").alias("score_sum"),
            (F.col("score_sum") >= threshold).alias("keep"),
        )
    )
