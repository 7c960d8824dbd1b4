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
from .partitioning import SAMPLE_DENOM

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
    token_mode: str = "ws",
) -> DataFrame:
    """Score = Σ over tokens of weight(md5_long(token) % n_buckets),
    integer-exact. Returns (id_col, n_tokens, score_sum, keep) with
    keep = score_sum >= KEEP_THRESHOLD — one row per input doc.
    """
    tok = docs.select(
        id_col,
        F.explode_outer(
            tokens(F.lower(F.col(text_col)), token_mode)
        ).alias("tok"),
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


# --- DSIR: Data Selection via Importance Resampling -------------------
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling"): estimate how target-like every raw document is as the
# likelihood ratio p_target(x)/p_raw(x) under two hashed-n-gram
# bag-of-words models, then resample the raw corpus by that weight.
#
# Integer doctrine adaptation (same reasoning as tf-idf's rational idf
# and text_profile.LM_SCALE): per-bucket Laplace-smoothed likelihood
# ratios are exact integer rationals at 6 digits; the document weight
# is the feature-count-weighted ARITHMETIC mean of its buckets' scaled
# ratios rather than the paper's geometric (log-sum) mean — log is not
# hash-exact across engines and double sums are partition-order-
# dependent. Monotone the same way: buckets relatively overrepresented
# in the target pull the weight above DSIR_SCALE, underrepresented
# ones pull it below.
#
# Intermediates run in 128-bit integers (Spark DECIMAL(38,0) — its
# `div` returns a LONG which wraps past 2^63, so per-bucket ratios are
# capped at DSIR_RATIO_CAP·DSIR_SCALE; DuckDB HUGEINT mirrors both the
# products and the cap).
DSIR_SCALE = 1_000_000
DSIR_RATIO_CAP = 1_000_000  # ratios clip at 10^6× target-enriched
DSIR_TARGET_RATE = 0.05
DSIR_BUCKETS = 1024


def _dsir_features(
    docs: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    is_target,
) -> DataFrame:
    """Per-doc hashed unigram+bigram bucket counts:
    (id, is_target, bucket, fcnt) with a NULL-bucket row for
    feature-less docs (explode_outer), checkpointed — it feeds both
    the model counts and the score join."""
    # tokenize ONCE into a bound lambda variable: referencing the raw
    # tokenize expression inside the bigram window lambda re-ran the
    # split per element (HOF lambdas don't eliminate inlined outer
    # subexpressions) — O(tokens²) per doc. Same fix as
    # text_profile._gram_array_from / dedup.segment_array.
    def _bi_of(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: md5_long(
                    F.concat(
                        F.lit("b|"),
                        F.element_at(toks, i),
                        F.lit(" "),
                        F.element_at(toks, i + F.lit(1)),
                    )
                )
                % n_buckets,
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    toks = tokens(F.lower(F.col(text_col)))
    uni = F.transform(
        toks, lambda t: md5_long(F.concat(F.lit("u|"), t)) % n_buckets
    )
    # sequence(1, n-1) DESCENDS when n < 2 — guard to empty
    bi = F.element_at(F.transform(F.array(toks), _bi_of), 1)
    return (
        docs.select(
            F.col(id_col),
            is_target.alias("is_target"),
            F.explode_outer(F.concat(uni, bi)).alias("bucket"),
        )
        .groupBy(id_col, "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("fcnt"))
        .localCheckpoint(eager=False)
    )


def dsir_importance(
    docs: DataFrame,
    target_rate: float = DSIR_TARGET_RATE,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_docs: DataFrame | None = None,
) -> DataFrame:
    """Hashed unigram+bigram importance weights for every document.

    With ``target_docs=None`` the target split is carved
    deterministically from the corpus itself (md5 split at
    ``target_rate``, the embed_decontaminate pattern) so the pinned
    query is self-contained. Passing ``target_docs`` is the
    deployment form (DSIR proper: target = the high-quality corpus
    you want more of, e.g. Wikipedia; raw = everything scored): the
    target model's bucket counts come from THAT corpus, every ``docs``
    row is raw (``is_target`` False throughout) and gets a weight.
    The count relations are the only coupling point either way.

    Plan shape (the 100 TB story): tokenize + hash to buckets as JVM
    expressions; ONE map-side-combinable groupBy builds the per-doc
    bucket relation; both n-gram models derive from it (n_buckets-
    bounded — the "model" is a ≤2·n_buckets-row table, broadcast by
    construction); scoring is a broadcast join + one per-doc
    aggregate. No windows, no all-pairs, no Python.

    Returns one row per doc: (id, is_target, n_feats, weight_scaled,
    keep) — weight_scaled NULL for target docs and feature-less docs;
    keep = raw doc with weight_scaled > DSIR_SCALE (more target-like
    than raw-like; compose quantile_prune for a top-p% cut instead).
    """
    if target_docs is None:
        is_target = (
            md5_long(
                F.concat(F.col(id_col).cast("string"), F.lit("|dsir"))
            )
            % SAMPLE_DENOM
        ) < int(target_rate * SAMPLE_DENOM)
        feats = _dsir_features(
            docs, n_buckets, text_col, id_col, is_target
        )
        counts = (
            feats.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.when(F.col("is_target"), F.col("fcnt")).otherwise(0)
                ).alias("cnt_t"),
                F.sum(
                    F.when(~F.col("is_target"), F.col("fcnt")).otherwise(0)
                ).alias("cnt_r"),
            )
        )
    else:
        feats = _dsir_features(
            docs, n_buckets, text_col, id_col, F.lit(False)
        )
        tcounts = (
            _dsir_features(
                target_docs, n_buckets, text_col, id_col, F.lit(True)
            )
            .filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.sum("fcnt").alias("cnt_t"))
        )
        rcounts = (
            feats.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.sum("fcnt").alias("cnt_r"))
        )
        counts = (
            tcounts.join(rcounts, ["bucket"], "full_outer")
            .select(
                "bucket",
                F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
                F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
            )
        )
    totals = counts.agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_r").alias("tot_r")
    )
    ratios = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "ratio_scaled",
            F.least(
                F.expr(
                    f"(CAST(cnt_t + 1 AS DECIMAL(38,0)) * (tot_r + {n_buckets})"
                    f" * {DSIR_SCALE}) div "
                    f"(CAST(cnt_r + 1 AS DECIMAL(38,0)) * (tot_t + {n_buckets}))"
                ),
                F.lit(DSIR_RATIO_CAP * DSIR_SCALE).cast("long"),
            ),
        )
        .select("bucket", "ratio_scaled")
    )
    scored = feats.join(F.broadcast(ratios), "bucket", "left").groupBy(
        id_col, "is_target"
    ).agg(
        F.sum(F.when(F.col("bucket").isNotNull(), F.col("fcnt")).otherwise(0))
        .cast("long")
        .alias("n_feats"),
        # decimal sum: fcnt·ratio can reach ~1e18 per row under the cap
        F.expr(
            "sum(CAST(fcnt AS DECIMAL(38,0)) * ratio_scaled) div sum(fcnt)"
        ).alias("_w"),
    )
    weight = F.when(
        ~F.col("is_target") & (F.col("n_feats") > 0), F.col("_w")
    )
    return scored.select(
        id_col,
        "is_target",
        "n_feats",
        weight.alias("weight_scaled"),
        (
            ~F.col("is_target")
            & (F.col("n_feats") > 0)
            & (weight > DSIR_SCALE)
        ).alias("keep"),
    )


# Selection priority scale: u ∈ [1, SAMPLE_DENOM] times this stays
# under 2^63 (1e6 · 1e12 = 1e18) while giving full resolution against
# the largest possible weight (DSIR_RATIO_CAP · DSIR_SCALE = 1e12).
DSIR_SELECT_SCALE = DSIR_RATIO_CAP * DSIR_SCALE


def dsir_select(
    docs: DataFrame,
    budget_docs: int,
    target_rate: float = DSIR_TARGET_RATE,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_docs: DataFrame | None = None,
    weights: DataFrame | None = None,
    salt: str = "dsirsel",
) -> DataFrame:
    """DSIR importance RESAMPLING — the step that makes the weights
    useful (Xie et al. 2023 §3: sample the raw corpus proportionally
    to importance weight under a document budget), as deterministic
    Sequential Poisson Sampling (Ohlsson 1998): each candidate gets a
    priority key u/w with u an md5-derived uniform, and the
    ``budget_docs`` SMALLEST keys win. Inclusion probability is
    ~proportional to weight, the draw is without replacement, and —
    because u is hashed from the id — the selected set is a pure
    function of (corpus, budget, salt): reproducible across runs,
    partitionings, and engines.

    Integer-exact throughout: the key is
    ``(u · DSIR_SELECT_SCALE) div weight_scaled`` with
    u ∈ [1, SAMPLE_DENOM], so u·scale ≤ 1e18 < 2^63 and both engines
    agree bit-for-bit; ties break on id. Candidates are raw docs with
    a positive weight (weight 0 = maximally un-target-like, never
    drawn; NULL = target/featureless, not eligible by construction).

    ``weights`` short-circuits the importance pass with a
    pre-computed ``dsir_importance`` output (the production shape:
    weigh once, draw many budgets). Ranking is the distributed
    ``global_row_numbers`` scan — no single-partition window.

    Returns one row per CANDIDATE: (id, weight_scaled, sel_key,
    sel_rank, selected) with selected = sel_rank < budget_docs.
    """
    if budget_docs < 0:
        raise ValueError(f"budget_docs must be >= 0, got {budget_docs}")
    from .partitioning import global_row_numbers

    if weights is None:
        weights = dsir_importance(
            docs, target_rate, n_buckets, text_col, id_col, target_docs
        )
    u = (
        md5_long(
            F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))
        )
        % SAMPLE_DENOM
        + 1
    )
    cand = (
        weights.filter(
            F.col("weight_scaled").isNotNull()
            & (F.col("weight_scaled") > 0)
        )
        .withColumn("_u", u)
        .withColumn(
            "sel_key",
            F.expr(f"({DSIR_SELECT_SCALE}L * _u) div weight_scaled"),
        )
        .select(id_col, "weight_scaled", "sel_key")
    )
    ranked = global_row_numbers(
        cand,
        [F.col("sel_key").asc(), F.col(id_col).asc()],
        out_col="sel_rank",
    )
    return ranked.select(
        id_col,
        "weight_scaled",
        "sel_key",
        F.col("sel_rank").cast("long").alias("sel_rank"),
        (F.col("sel_rank") < budget_docs).alias("selected"),
    )
