"""Corpus partitioning utilities for the training-data pipeline:
deterministic subsampling, distributed global ranks, and size-balanced
shard assignment.

These are the operations that slice a 100 TB corpus into training
mixes and output shards. All three are deterministic functions of the
data (md5-keyed sampling; total-order ranks), so every one has an
exact DuckDB oracle — no RNG state, no run-to-run drift, and a re-run
of an interrupted pipeline reproduces the identical split.

Scale notes:
- ``hash_sample`` is a narrow filter — it pushes into the scan stage,
  no shuffle, and composes with partition pruning.
- ``global_row_numbers`` is the distributed form of a global
  ``row_number()``: a range repartition (one shuffle), per-partition
  local numbering (parallel windows), and cumulative partition-count
  offsets (metadata-scale rows). The naive global window funnels the
  whole table through ONE task; this keeps every stage wide while
  producing the exact same total-order ranks.
- ``shard_assignments`` deals the size-ranked corpus serpentine
  (boustrophedon) across shards, so shard byte-totals differ by at
  most one size band — the standard greedy-balance surrogate that
  needs only a rank, not a driver-side bin-packing loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long

# Sampling resolution: rates snap to 1/SAMPLE_DENOM steps.
SAMPLE_DENOM = 1_000_000


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``:
    keep rows where md5_long(key || '|' || salt) mod 1e6 < rate·1e6.

    Unlike ``df.sample`` (seeded per-partition RNG — resplitting the
    input changes the sample), membership depends only on the key
    value, so the sample is stable across partitionings, engines and
    re-runs, and different ``salt`` values give independent samples
    (e.g. train/validation splits that provably cannot overlap when
    drawn from complementary rate windows).
    """
    bucket = md5_long(
        F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))
    ) % SAMPLE_DENOM
    return df.filter(bucket < int(rate * SAMPLE_DENOM))


def source_caps(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-style per-source capping: keep at most ``cap`` docs per
    source, preferring larger docs (size DESC, id ASC tie-break), and
    report each keeper's 1-based rank within its source as
    ``source_rank``.

    One shuffle on ``source_col``; each source's rows meet in one
    window task. That is the right shape while no single source
    outweighs an executor; for web-crawl hot domains (a source with
    billions of rows) use ``source_caps_salted`` — the two-stage form
    with bounded task size and the IDENTICAL result.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.col(size_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= cap)
    )


def source_caps_salted(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """``source_caps`` with bounded task size for hot sources, same
    rows and ranks EXACTLY.

    Stage 1 pre-caps per (source, salt-bucket of the id hash): any
    row outside its bucket's top-``cap`` is outside the source's
    top-``cap`` a fortiori, so discarding it is lossless. Stage 2 runs
    the exact window over the ≤ cap·n_salts survivors per source.
    The biggest task shrinks from |hottest source| to
    max(|source|/n_salts (stage 1, hash-balanced), cap·n_salts
    (stage 2)) — tune ``n_salts`` ≈ sqrt(|hottest|/cap).
    """
    salt = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit("|capsalt"))
    ) % n_salts
    order = (F.col(size_col).desc(), F.col(id_col).asc())
    pre = Window.partitionBy(source_col, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_pre_rank", F.row_number().over(pre))
        .filter(F.col("_pre_rank") <= cap)
        .drop("_salt", "_pre_rank")
    )
    final = Window.partitionBy(source_col).orderBy(*order)
    return (
        survivors.withColumn("source_rank", F.row_number().over(final))
        .filter(F.col("source_rank") <= cap)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Exact-N-per-stratum sample, deterministic: rank each stratum's
    rows by (md5_long(id || '|' || salt), id) and keep the first N.
    The hash order is a fixed uniform permutation of the stratum, so
    membership is a reproducible draw — independent of partitioning,
    stable across re-runs, and a different ``salt`` gives an
    independent draw (disjointness is NOT guaranteed between salts,
    unlike ``hash_sample``'s rate windows).
    """
    h = md5_long(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def global_row_numbers(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rn",
    num_partitions: int = 64,
) -> DataFrame:
    """Exact global row_number() 0..N-1 by ``order_cols`` (which must
    be a TOTAL order — include a tie-break key) without a
    single-partition window.

    repartitionByRange puts rows in globally ordered partition ranges;
    each partition numbers itself locally (parallel windows); the
    per-partition counts (≤ ``num_partitions`` rows) turn into
    cumulative offsets with a metadata-scale running sum, kept lazy in
    the same plan so the range exchange is reused, not recomputed.
    Because offsets accumulate in partition order = range order, the
    final rank is the exact global one regardless of where the range
    sampler drew its boundaries.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    local = (
        # the lazy checkpoint pins ONE physical execution of the range
        # exchange: the rank rows and the offset aggregate below must
        # see identical partition boundaries, and RangePartitioner
        # draws them from a sample — exchange reuse usually
        # deduplicates the subtree, but the checkpoint makes the
        # consistency unconditional (e.g. spark.sql.exchange.reuse
        # off, or planner changes that defeat canonicalization)
        df.repartitionByRange(num_partitions, *cols)
        .localCheckpoint(eager=False)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)) - 1,
        )
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_rn") + F.col("_off"))
        .drop("_pid", "_rn", "_off")
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    size_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic size-balanced shard assignment: rank docs by
    (size DESC, id), deal serpentine — rank r goes to shard ``r mod n``
    on even rounds and ``n-1 - (r mod n)`` on odd rounds — so each
    shard receives exactly one doc per size band and byte totals stay
    balanced without any driver-side packing loop.
    """
    ranked = global_row_numbers(
        df, [F.col(size_col).desc(), F.col(id_col).asc()], out_col="_grank"
    )
    pos = F.col("_grank") % n_shards
    rnd = F.floor(F.col("_grank") / n_shards)
    shard = F.when(rnd % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn("shard", shard.cast("int")).drop("_grank")


def prefix_sums(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int = 64,
) -> DataFrame:
    """Exact global running SUM of ``value_col`` in ``order_cols``
    order (must be a TOTAL order — include a tie-break key) without a
    single-partition window: the distributed prefix-sum (scan).

    Same shape as ``global_row_numbers``: repartitionByRange gives
    globally ordered partition ranges, each partition cumsums locally
    (parallel windows), and the per-partition VALUE TOTALS (≤
    ``num_partitions`` rows) become broadcast offsets via a
    metadata-scale running sum. The result is invariant to where the
    range sampler drew its boundaries because offsets accumulate in
    range order.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    local = (
        # same consistency pin as global_row_numbers: cumsums and
        # offset totals must see the one materialized range exchange
        df.repartitionByRange(num_partitions, *cols)
        .localCheckpoint(eager=False)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_cum",
            F.sum(value_col).over(
                Window.partitionBy("_pid")
                .orderBy(*cols)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sums = local.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_pid", F.coalesce(F.sum("_tot").over(prior), F.lit(0)).alias("_off")
    )
    # Integral inputs get a long running sum (sum() widens to the same);
    # fractional/decimal inputs keep sum()'s own result type — casting
    # those to long would silently truncate.
    from pyspark.sql import types as T

    total = F.col("_cum") + F.col("_off")
    integral = isinstance(
        df.schema[value_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, total.cast("long") if integral else total)
        .drop("_pid", "_cum", "_off")
    )


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Data mixing under a token budget: walk documents from highest
    quality down (ties on id) and keep them while the running token
    total stays within ``budget_tokens`` — the standard
    "best N tokens" curation cut.

    ``token_counts`` swaps the whitespace denomination for a
    precomputed (id, n_tokens) relation — the hook for
    TOKENIZER-denominated budgets (``operators.bpe.bpe_token_counts``
    renamed to ``n_tokens``), since a budget in BPE units is what the
    training run actually spends. Ordering stays by quality score;
    only the running-total denomination changes. The relation must
    cover every doc: a doc absent from ``token_counts`` raises at
    execution (lazy ``raise_error``, no extra pass) instead of being
    silently dropped from the selection — a partial counts relation
    shrinking the corpus without a sound is the failure mode this
    guards against.

    The running total is the distributed ``prefix_sums`` scan, so the
    selection needs no single-partition window and no driver loop at
    any corpus size. Every doc is returned with its running total and
    a ``selected`` flag (the budget cut is a filter away).
    """
    from .text_profile import quality_scores

    scored = quality_scores(docs, text_col, id_col).select(
        id_col, "n_tokens", "quality_score"
    )
    if token_counts is not None:
        # left join + lazy raise, NOT an inner join: an inner join
        # would silently drop docs the counts relation missed
        scored = (
            scored.drop("n_tokens")
            .join(
                token_counts.select(
                    id_col, F.col("n_tokens").alias("_tc_tokens")
                ),
                id_col,
                "left",
            )
            .withColumn(
                "n_tokens",
                F.when(
                    F.col("_tc_tokens").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "token_budget_select: token_counts has no "
                                "n_tokens row for doc "
                            ),
                            F.col(id_col).cast("string"),
                        )
                    ),
                ).otherwise(F.col("_tc_tokens")),
            )
            .drop("_tc_tokens")
        )
    cum = prefix_sums(
        scored,
        [F.col("quality_score").desc(), F.col(id_col).asc()],
        "n_tokens",
        out_col="cum_tokens",
    )
    return cum.select(
        id_col,
        "quality_score",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "cum_tokens",
        (F.col("cum_tokens") <= budget_tokens).alias("selected"),
    )


def mix_plan(
    docs: DataFrame,
    budget_docs: int,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mix allocation: apportion a document budget across
    sources by integer weights (largest-remainder / Hamilton method)
    and draw each source's quota deterministically.

    Allocation runs over the per-source count relation — #sources
    rows, metadata-scale — so the global remainder-ranking window is
    deliberate (same class as the offset windows in
    ``global_row_numbers``). base_s = floor(budget·w_s / W) with W the
    weight sum over PRESENT sources; the budget − Σ base leftover goes
    one-each to the largest remainders (ties on source name). Quotas
    cap at availability (no redistribution — the plan reports what the
    mix could not satisfy via ``source_alloc`` vs actual rows).
    Member draw per source = the ``stratified_sample`` hash order, so
    the selection is reproducible and partitioning-independent.
    Sources absent from ``weights`` are excluded. Rows: (doc_id,
    source, mix_rank, source_alloc) for every selected doc.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"mix_plan weights must be non-negative: {weights}")
    # Zero-weight sources own no budget share by definition — drop them
    # up front so the present-source weight sum is positive whenever
    # any weighted source exists (an all-zero mix would otherwise
    # divide by a NULL-producing 0 and return silently-empty results).
    positive = {s: w for s, w in weights.items() if w > 0}
    if not positive:
        raise ValueError(
            "mix_plan needs at least one strictly positive weight "
            f"(got {weights})"
        )
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        sorted(positive.items()), f"{source_col} string, _w long"
    )
    return _mix_from_weights(docs, budget_docs, wdf, source_col, id_col)


def temperature_mix_plan(
    docs: DataFrame,
    budget_docs: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled training mix (the multilingual/T5 practice:
    sample source s with probability ∝ n_s^alpha, flattening the
    head so small sources are not drowned), with alpha PINNED at 0.5:
    sqrt is the one temperature whose weights stay integer-exact —
    ``floor(sqrt(n))`` equals ``isqrt(n)`` for every count below 2^52
    under IEEE correctly-rounded sqrt, identical on both engines,
    where a general ``n^0.3`` would be irrational and engine-rounded.
    Weights feed the same largest-remainder allocation and
    deterministic hash draw as ``mix_plan`` — and they derive from the
    per-source count relation IN-PLAN (metadata-scale, no driver
    round-trip, no hand-maintained weight dict going stale as the
    corpus grows)."""
    wdf = (
        docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            source_col,
            F.expr("CAST(floor(sqrt(_n)) AS BIGINT)").alias("_w"),
        )
    )
    return _mix_from_weights(docs, budget_docs, wdf, source_col, id_col)


def _mix_from_weights(
    docs: DataFrame,
    budget_docs: int,
    wdf: DataFrame,
    source_col: str,
    id_col: str,
) -> DataFrame:
    """Shared allocation + draw core: largest-remainder apportionment
    over the (source, _w) relation, availability-capped, then the
    deterministic per-source hash draw."""
    avail = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_avail"))
    present = avail.join(F.broadcast(wdf), source_col)
    # global windows over the #sources-row frame (metadata scale, like
    # the offset windows in global_row_numbers) — one frame, no
    # self-referential joins
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rank_rem = Window.orderBy(F.desc("_rem"), F.asc(source_col))
    alloc = (
        present.withColumn("_wsum", F.sum("_w").over(whole))
        .withColumn("_base", F.expr(f"({budget_docs} * _w) div _wsum"))
        .withColumn("_rem", F.expr(f"({budget_docs} * _w) % _wsum"))
        .withColumn(
            "_extras", F.lit(budget_docs) - F.sum("_base").over(whole)
        )
        .withColumn("_rk", F.row_number().over(rank_rem))
        .withColumn(
            "_alloc",
            F.least(
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_extras"), 1).otherwise(0),
                F.col("_avail"),
            ),
        )
        .select(source_col, "_alloc")
    )
    h = md5_long(F.concat(F.col(id_col).cast("string"), F.lit("|mix")))
    draw = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.join(F.broadcast(alloc), source_col)
        .withColumn("mix_rank", F.row_number().over(draw))
        .filter(F.col("mix_rank") <= F.col("_alloc"))
        .select(
            id_col,
            source_col,
            F.col("mix_rank").cast("int").alias("mix_rank"),
            F.col("_alloc").cast("int").alias("source_alloc"),
        )
    )


def split_plan(
    df: DataFrame,
    key_col: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment from disjoint
    windows of the SAME md5 bucket: bucket < val share → 'val', next
    window → 'test', remainder → 'train'. Because one hash draw feeds
    all three CASE arms, the splits are disjoint and exhaustive BY
    CONSTRUCTION (no row can land in two, none can be dropped) —
    unlike three independent samples, which must be proven disjoint.
    Stable under repartitioning and engines, like ``hash_sample``.
    Adds a ``split`` column; rates are validated."""
    if not (0 <= val_rate and 0 <= test_rate and val_rate + test_rate < 1):
        raise ValueError(
            f"need val_rate + test_rate in [0, 1): {val_rate}, {test_rate}"
        )
    bucket = md5_long(
        F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))
    ) % SAMPLE_DENOM
    val_hi = int(val_rate * SAMPLE_DENOM)
    test_hi = val_hi + int(test_rate * SAMPLE_DENOM)
    split = (
        F.when(bucket < val_hi, "val")
        .when(bucket < test_hi, "test")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def epoch_order(
    shards: DataFrame,
    epoch: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order: within each shard, rank
    docs by ``md5(id || '|epoch' || epoch)`` — a different uniform
    permutation every epoch, bit-identical on every re-run/engine (the
    reproducibility a training manifest needs: "epoch 3 order" is a
    pure function of ids, never of partitioning or RNG state).

    Plan shape: ONE window partitioned BY SHARD — each shard sorts its
    own ~N/n_shards rows in parallel; there is no global sort, and at
    100 TB the shard is the natural parallel unit (one reader task
    consumes one shard in order). Compose after
    ``shard_assignments``.
    """
    h = md5_long(
        F.concat(
            F.col(id_col).cast("string"), F.lit(f"|epoch{int(epoch)}")
        )
    )
    w = Window.partitionBy(shard_col).orderBy(h.asc(), F.col(id_col).asc())
    return shards.withColumn(
        "position", (F.row_number().over(w) - 1).cast("long")
    )
