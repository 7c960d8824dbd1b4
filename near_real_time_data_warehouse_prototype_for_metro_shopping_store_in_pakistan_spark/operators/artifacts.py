"""Persisted ANN artifacts: trained k-means centroids and PQ
codebooks as immutable parquet relations with content fingerprints.

The BPE merge table established the artifact discipline
(operators/bpe.py ``save_merges``/``load_merges``/
``merges_fingerprint``): a trained model that denominates a dataset
build or serves a long-lived index must be (a) persisted immutably,
(b) re-loadable bit-exactly, and (c) fingerprinted into the build's
config guard so a changed artifact refuses to silently merge with an
old build. Trained centroids (``similarity.kmeans_centroids``) and PQ
codebooks (``pq.pq_codebooks`` / ``pq_codebooks_residual``) are the
other two trained artifacts in this engine — without persistence the
streaming index facades retrain per stream and "we served with THESE
centroids" is unanswerable after the session dies.

Unlike the merge table (rank order is semantic → order-SENSITIVE
fingerprint), these relations are keyed sets — (centroid_id) and
(subspace, code) — so their fingerprints are order-INSENSITIVE:
count + sum of per-row content hashes, one constant-size aggregate,
nothing collected (the ``DatasetBuilder._relation_fingerprint``
shape, extended to hash full row content rather than just ids).

Beyond reference parity: the reference has no model artifacts
(src/Meshjoin.java holds everything in memory per run); this is
LLM-pipeline extension surface (SURVEY.md §2 extension block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CENTROID_COLS = ["centroid_id", "cq", "cn"]
CODEBOOK_COLS = ["subspace", "code", "cq"]


def _content_fingerprint(df: DataFrame, content_expr: str) -> str:
    """Order-insensitive content fingerprint ``<n>:<sum>``: row count
    plus the decimal(38,0)-exact sum of xxhash64 over each row's
    canonical content string. Commutative/associative sum = identical
    under any partitioning or row order; multiplicity-sensitive
    (unlike xor, where duplicate rows self-cancel)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"sum(cast(xxhash64({content_expr}) as decimal(38,0)))"
        ).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


def _centroid_content() -> str:
    return (
        "concat(cast(centroid_id as string), '|', "
        "array_join(cq, ','), '|', cast(cn as string))"
    )


def _codebook_content() -> str:
    return (
        "concat(cast(subspace as string), '|', "
        "cast(code as string), '|', array_join(cq, ','))"
    )


def centroids_fingerprint(cents: DataFrame) -> str:
    """``cent:<n>:<sum>`` over the full (centroid_id, cq, cn) content
    — the value a build-config guard records and a loader verifies."""
    return "cent:" + _content_fingerprint(cents, _centroid_content())


def codebooks_fingerprint(books: DataFrame) -> str:
    """``pq:<n>:<sum>`` over the full (subspace, code, cq) content."""
    return "pq:" + _content_fingerprint(books, _codebook_content())


def save_centroids(cents: DataFrame, path: str) -> None:
    """Persist a trained coarse-quantizer relation
    (``similarity.kmeans_centroids`` output: centroid_id, cq
    array<long>, cn long) as an immutable parquet artifact. Write
    mode ``error``: artifacts are never overwritten (same versioning
    discipline as the BPE merge table and the dataset snapshots)."""
    missing = [c for c in CENTROID_COLS if c not in cents.columns]
    if missing:
        raise ValueError(
            f"centroid relation missing columns {missing}; expected "
            f"{CENTROID_COLS} (kmeans_centroids output)"
        )
    cents.select(*CENTROID_COLS).coalesce(1).write.mode(
        "error"
    ).parquet(path)


def load_centroids(spark: SparkSession, path: str) -> DataFrame:
    """Load a persisted centroid artifact back into the exact shape
    ``ann_ivf_topk(centroids=...)`` / the streaming index facades
    consume. Validates key uniqueness so a corrupted or
    double-written artifact fails loudly."""
    cents = spark.read.parquet(path).select(*CENTROID_COLS)
    n, k = cents.select(
        F.count(F.lit(1)), F.countDistinct("centroid_id")
    ).collect()[0]
    if n != k:
        raise ValueError(
            f"corrupt centroid artifact at {path}: {n} rows but only "
            f"{k} distinct centroid_id values"
        )
    return cents


def save_codebooks(books: DataFrame, path: str) -> None:
    """Persist trained PQ codebooks (``pq.pq_codebooks`` /
    ``pq_codebooks_residual`` output: subspace, code, cq) immutably
    (write mode ``error``)."""
    missing = [c for c in CODEBOOK_COLS if c not in books.columns]
    if missing:
        raise ValueError(
            f"codebook relation missing columns {missing}; expected "
            f"{CODEBOOK_COLS} (pq_codebooks output)"
        )
    books.select(*CODEBOOK_COLS).coalesce(1).write.mode(
        "error"
    ).parquet(path)


def load_codebooks(spark: SparkSession, path: str) -> DataFrame:
    """Load persisted PQ codebooks. Validates (subspace, code) key
    uniqueness AND per-subspace code density (codes must be
    0..ksub-1 in every subspace — ``pq_encode``'s dense-code
    contract) so a truncated artifact cannot silently mis-encode."""
    books = spark.read.parquet(path).select(*CODEBOOK_COLS)
    rows = books.groupBy("subspace").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("code").alias("k"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
    ).collect()
    if not rows:
        raise ValueError(f"empty codebook artifact at {path}")
    ksub = rows[0]["n"]
    for r in rows:
        if not (r["n"] == r["k"] == ksub and r["lo"] == 0
                and r["hi"] == ksub - 1):
            raise ValueError(
                f"corrupt codebook artifact at {path}: subspace "
                f"{r['subspace']} has {r['n']} rows, {r['k']} distinct "
                f"codes in [{r['lo']}, {r['hi']}] (expected dense "
                f"0..{ksub - 1})"
            )
    return books


LM_COLS = ["ctx", "w", "c2"]


def lm_fingerprint(counts: DataFrame, lang_col: str | None = None) -> str:
    """``lm:<n>:<sum>`` over the full ([lang,] ctx, w, c2) content —
    the n-gram model relation (``text_profile.bigram_lm_counts``) is
    the last trained artifact in the engine without one: a fluency
    gate's identity IS its count table."""
    cols = ([lang_col] if lang_col else []) + LM_COLS
    expr = "concat_ws('|', " + ", ".join(
        f"cast({c} as string)" for c in cols
    ) + ")"
    return "lm:" + _content_fingerprint(counts, expr)


def save_lm_counts(
    counts: DataFrame, path: str, lang_col: str | None = None
) -> None:
    """Persist a trained n-gram model relation immutably (write mode
    ``error``) — the retrain-free restart path for the streaming
    CCNet fluency gate."""
    cols = ([lang_col] if lang_col else []) + LM_COLS
    missing = [c for c in cols if c not in counts.columns]
    if missing:
        raise ValueError(
            f"LM count relation missing columns {missing}; expected "
            f"{cols} (bigram_lm_counts output)"
        )
    counts.select(*cols).coalesce(1).write.mode("error").parquet(path)


def load_lm_counts(
    spark: SparkSession, path: str, lang_col: str | None = None
) -> DataFrame:
    """Load a persisted n-gram model. Validates ([lang,] ctx, w) key
    uniqueness and positive counts — a doubled gram row would double
    its probability mass silently."""
    cols = ([lang_col] if lang_col else []) + LM_COLS
    counts = spark.read.parquet(path).select(*cols)
    keys = cols[:-1]
    row = counts.select(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(*keys).alias("k"),
        F.min("c2").alias("mn"),
    ).collect()[0]
    if row["n"] != row["k"]:
        raise ValueError(
            f"corrupt LM artifact at {path}: {row['n']} rows but only "
            f"{row['k']} distinct {tuple(keys)} keys"
        )
    if row["mn"] is not None and row["mn"] < 1:
        raise ValueError(
            f"corrupt LM artifact at {path}: count below 1 ({row['mn']})"
        )
    return counts
