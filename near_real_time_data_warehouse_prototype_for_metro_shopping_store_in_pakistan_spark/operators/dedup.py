"""Deduplication operator family for the training-data pipeline.

The reference's dedup surface is exact-line dedup on the stream
(src/GenerateStream.java:38-43, an O(n²) List.contains) and key dedup
on master data (src/Meshjoin.java:108-117, a HashSet) — both are
``dropDuplicates`` in Spark. A 100 TB corpus additionally needs
*near*-dup detection; this module provides the standard ladder:

- exact (hash groupBy),
- n-gram Jaccard (exact set similarity; quadratic in the worst case,
  bounded by shingle-bucket joins),
- MinHash + LSH banding (the scale path: candidates only collide in
  O(#bands) buckets, no all-pairs),
- SimHash fingerprints (constant-size signature per doc),
- n-gram benchmark decontamination (broadcast eval grams, the corpus
  side shuffle-free).

All hashing uses the portable md5-prefix hash (functions.text.md5_long)
so every operator has an exact DuckDB oracle. Determinism: all
similarity math is integer counts / integer hashes; Jaccard is a ratio
of identical integers on both engines.

Scale notes (100 TB):
- Shingling explodes ~len(text) rows per doc; it is a narrow map — no
  shuffle until the groupBy/join on shingle. Shingle buckets are
  naturally skewed (common 5-grams) — for the Jaccard path we rely on
  AQE skew handling; the MinHash path never joins raw shingles, its
  only wide op is the band-bucket join on 16-byte keys.
- ``num_hashes=16, band_size=2`` (8 bands) targets the calibrated
  near-dup threshold j≈0.5: P(collide) = 1-(1-j^2)^8 ≈ 0.9 at j=0.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, tokens


def _shuffle_parts(df: DataFrame) -> int:
    """The session's configured shuffle width, used for EXPLICIT
    repartition counts on compute-heavy narrow relations.

    AQE coalesces post-shuffle partitions by *byte size*, which is the
    wrong signal for stages whose rows are tiny but expensive (a
    461k-row candidate list is ~7 MB — one AQE partition — yet each row
    runs an array_intersect over ~300-element sets). An explicit
    numPartitions repartition is exempt from AQE coalescing, restoring
    full-core parallelism for the verify/band-join stages."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return 200


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one row per distinct text with the keeper id (min)
    and the multiplicity. Equivalent to the reference's
    ``allRecords.contains`` stream dedup done set-at-a-time."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def char_shingles(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """Character n-gram shingles per document: (id, shingle), distinct
    per doc by default (set ``distinct=False`` when a downstream
    aggregation subsumes the dedup — saves the shuffle).

    Narrow explode; ~len(text) rows per doc before dropDuplicates
    (that shuffle, not the explode, is the dominant cost). Generated
    as explode(sequence) + substr — flat codegen expressions rather
    than an interpreted transform(...) lambda.
    """
    out = (
        docs.filter(F.length(text_col) >= n)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - (n - 1))
            ).alias("_pos"),
        )
        .select(
            id_col, F.col(text_col).substr(F.col("_pos"), F.lit(n)).alias("shingle")
        )
    )
    return out.dropDuplicates([id_col, "shingle"]) if distinct else out


def shingle_hash_sets(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "_shset",
) -> DataFrame:
    """Per-doc DISTINCT 60-bit shingle fingerprints (md5_long) as one
    sorted array column — ONE shuffle-free Arrow pass.

    A document's shingle set depends only on its own text, so the
    explode + md5 + collect_set formulation (narrow explode, then a
    full-corpus groupBy exchange) is replaced by per-doc hashing
    inside ``mapInPandas``: zero shuffles, embarrassingly parallel
    across input splits. Same fingerprint convention — and the same
    negligible-collision caveat (p ≈ vocab²/2⁶¹) — as the GEMM tile
    kernel and the verified-ladder sets."""
    import hashlib

    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<long>"

    def gen(batches):
        for pdf in batches:
            ids, sets = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < n:
                    continue
                shingles = {text[i : i + n] for i in range(len(text) - n + 1)}
                h60 = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                ids.append(did)
                sets.append(np.unique(h60))
            if not ids:
                continue
            yield pd.DataFrame({id_col: ids, out_col: sets})

    src = docs.select(id_col, text_col)
    parts = _shuffle_parts(docs)
    if src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts)
    return src.mapInPandas(gen, schema)


def dense_ids(
    df: DataFrame, key_col: str, out_col: str = "sid", num_partitions: int = 64
) -> DataFrame:
    """Assign dense ids 0..N-1 to the distinct values of ``key_col``
    WITHOUT a single-partition global sort over the values.

    Distributed zipWithIndex: hash-repartition the distinct keys into
    a FIXED partition count (explicit, so AQE cannot re-coalesce and
    perturb ids), sort and number each partition locally (a
    per-partition window — parallel), and add each partition's
    cumulative offset back with a broadcast join. The offsets come
    from a running sum over the per-partition COUNTS — a global window
    over ≤ ``num_partitions`` rows (metadata-scale), kept lazy inside
    the one plan so the partitioned exchange is REUSED rather than
    recomputed by a separate job. Deterministic: hash placement and
    local sort are both stable. Ids are dense and unique but NOT
    globally ordered — callers that only need a bijection (e.g.
    matrix-encoding a vocabulary) get full parallelism.
    """
    from pyspark.sql import Window

    local = (
        df.select(key_col)
        .distinct()
        .repartition(num_partitions, key_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(key_col)) - 1,
        )
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        key_col, (F.col("_rn") + F.col("_off")).alias(out_col)
    )


# block_gemm replicates the corpus O(n_docs / block_size) times — an
# exact all-pairs op. Above this (estimated) corpus size the replication
# dominates any BLAS win and auto must take the prefix-filtered join.
GEMM_MAX_DOCS = 50_000


def _pick_jaccard_strategy(avg_df: float, est_docs: float) -> str:
    """Cost-based physical-strategy choice from two column stats:
    mean shingle document-frequency (overlap density) and estimated
    corpus size (block-replication bound). Pure so it is unit-testable
    with any stats."""
    if est_docs > GEMM_MAX_DOCS:
        return "shingle_join"
    return "block_gemm" if avg_df > 8 else "shingle_join"


def jaccard_similar_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "auto",
    num_salts: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard >=
    threshold). Two physical strategies, identical output:

    - ``block_gemm`` (default): hash each doc's shingle set (60-bit
      md5 ids, no global dictionary) and compute ALL pairwise
      intersection sizes as a tiled binary matrix product
      (cogrouped ``applyInPandas`` + numpy, like
      similarity.cosine_neardup_pairs); the hashes become tile-local
      dense ids inside each Arrow task. Wins when shingle overlap is
      DENSE (small vocab / near-dup-heavy corpora): the shingle-join
      materializes Σ_s C(df_s, 2) rows — ~15e9 on the sf0.1 documents
      table (2k distinct shingles × ~4k-doc buckets) — while the GEMM
      moves each doc O(#blocks) times and multiplies in BLAS. Its only
      pre-tile shuffle is one map-side-combinable ``collect_set``.
    - ``shingle_join``: PPJoin-style prefix-filtered bucket join —
      the classic sparse-overlap path (big vocab, rare collisions),
      where the dictionary-dense matrix would be wasteful.
    - ``auto`` (default): an O(1) probe — corpus row count (metadata
      on parquet) plus a LIMIT-bounded shingle aggregate — estimates
      mean document frequency and picks the strategy, the same
      cost-based physical-plan choice an optimizer would make from
      column stats, at a cost independent of corpus size. Corpus size
      is a hard bound: block_gemm replicates the corpus O(#blocks)
      times, so above ``GEMM_MAX_DOCS`` the prefix-filtered join
      always wins regardless of density.
    """
    if strategy == "auto":
        # O(1) column-stats probe, corpus-size independent: corpus
        # row count from a count() (metadata-only on parquet) and
        # overlap density from LIMIT-bounded shingle scans (a couple
        # of row groups, never the corpus). Full-corpus mean document
        # frequency extrapolates as n_docs · shingles-per-doc / vocab
        # — exact only when the probe's vocabulary has SATURATED
        # (char-n-grams; the dense regime this stat exists to detect).
        # A still-growing vocabulary would make the extrapolation
        # overshoot and mis-route a sparse corpus onto the
        # corpus-replicating GEMM, so a half-vs-full vocab comparison
        # guards it: if the second thousand probe docs still grew the
        # vocabulary materially, density is NOT trusted and the
        # prefix-filtered join (safe at any scale) is chosen.
        probe_docs = 2_000
        est_docs = docs.count()
        probe = docs.limit(probe_docs)
        # one aggregate measures both the probe vocabulary and the
        # vocabulary of a deterministic random HALF of the probe docs
        # (md5 split — robust to source-clustered file order): if the
        # half already saw (almost) every shingle the full probe saw,
        # the vocabulary has saturated and extrapolation is sound
        half = (
            md5_long(F.concat(F.col(id_col).cast("string"), F.lit("|probe")))
            % 2
            == 0
        )
        stats = (
            char_shingles(probe, n, text_col, id_col)
            .withColumn("_half", half)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.approx_count_distinct("shingle").alias("vocab"),
                F.approx_count_distinct(
                    F.when(F.col("_half"), F.col("shingle"))
                ).alias("half_vocab"),
                F.approx_count_distinct(id_col).alias("docs"),
            )
            .first()
        )
        saturated = (
            est_docs <= probe_docs  # probe saw everything: stats exact
            or stats["vocab"] <= max(stats["half_vocab"], 1) * 1.15
        )
        if stats["docs"] and saturated:
            per_doc = stats["rows"] / stats["docs"]
            avg_df = est_docs * per_doc / max(stats["vocab"], 1)
        else:
            avg_df = 0.0  # growing vocab: force the sparse path
        strategy = _pick_jaccard_strategy(avg_df, est_docs)
    if strategy == "block_gemm":
        # num_salts is a shingle-join knob; the GEMM path has no
        # bucket self-join to salt.
        return _jaccard_block_gemm(docs, n, threshold, text_col, id_col)
    assert strategy == "shingle_join", strategy
    return _jaccard_shingle_join(
        docs, n, threshold, text_col, id_col, num_salts
    )


def _jaccard_block_gemm(
    docs: DataFrame,
    n: int,
    threshold: float,
    text_col: str,
    id_col: str,
    block_size: int = 1024,
) -> DataFrame:
    """Tiled exact set-intersection counting: docs × docs through a
    binary membership matrix, one numpy product per tile.

    Shingles are identified by their 60-bit md5 prefix (md5_long), so
    the plan needs NO global shingle dictionary at all: the only wide
    operation before the tile cogroup is ONE map-side-combinable
    ``collect_set`` (the raw explode is narrow, and min/set semantics
    make the per-doc distinct shuffle redundant). Hash→dense-id
    translation happens per tile in the Arrow stage with
    ``np.unique``/``searchsorted`` over just that tile's values, which
    parallelizes with the tiles and scales to word-level vocabularies
    with zero coordination. Intersection counts over hashed sets equal
    counts over the string sets absent a 60-bit collision within a
    compared pair (p ≈ vocab²/2⁶¹ — negligible below ~10⁷ distinct
    shingles; swap md5_long for the full 128-bit digest if a corpus
    ever approaches that)."""
    import numpy as np
    import pandas as pd

    doc_sets = (
        shingle_hash_sets(docs, n, text_col, id_col, out_col="sids")
        .select(F.col(id_col).alias("vid"), "sids")
        # left and right below both read this relation; the lazy local
        # checkpoint materializes it once inside the cogroup job
        # instead of re-running the Arrow hashing pass per side.
        .localCheckpoint(eager=False)
    )
    v = doc_sets.withColumn("blk", F.floor(F.col("vid") / block_size).cast("long"))
    # Block domain from the OCCUPIED blocks of the raw id column — a
    # column-pruned scan of ids only (never the aggregated doc sets),
    # bounded by document count. Deriving it from the id min/max RANGE
    # instead would explode for sparse id domains (epoch-millis or
    # snowflake-style ids span ~1e12 — that range div block_size is
    # ~1e9 phantom blocks and a ~1e18-pair block join).
    blks = (
        docs.select(
            F.floor(F.col(id_col) / block_size).cast("long").alias("blk")
        )
        .distinct()
    )
    pairs = (
        blks.alias("x")
        .join(blks.alias("y"), F.col("x.blk") <= F.col("y.blk"))
        .select(F.col("x.blk").alias("ba"), F.col("y.blk").alias("bb"))
    )
    left = (
        v.alias("l")
        .join(F.broadcast(pairs.alias("pl")), F.col("l.blk") == F.col("pl.ba"))
        .select("pl.ba", "pl.bb", "l.vid", "l.sids")
    )
    right = (
        v.alias("r")
        .join(F.broadcast(pairs.alias("pr")), F.col("r.blk") == F.col("pr.bb"))
        .select(
            F.col("pr.ba").alias("rba"),
            F.col("pr.bb").alias("rbb"),
            F.col("r.vid").alias("rvid"),
            F.col("r.sids").alias("rsids"),
        )
    )

    def tile(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        if lpdf.empty or rpdf.empty:
            return empty
        la = [np.asarray(x, dtype=np.int64) for x in lpdf["sids"]]
        lb = [np.asarray(x, dtype=np.int64) for x in rpdf["rsids"]]
        # Tile-local dense ids: the union of this tile's hash values,
        # remapped by binary search — O(nnz log v) with v = the TILE's
        # vocabulary, independent of any global dictionary.
        uniq = np.unique(np.concatenate(la + lb))
        vmax = len(uniq)
        # Hash->dense remap once per doc (NOT per chunk: the remap is
        # the O(nnz log v) part, the chunk loop below only slices it).
        da = [np.searchsorted(uniq, s) for s in la]
        db = [np.searchsorted(uniq, s) for s in lb]
        inter = np.zeros((len(la), len(lb)), dtype=np.int64)
        chunk = 1 << 15
        for lo in range(0, vmax, chunk):
            hi = min(lo + chunk, vmax)
            A = np.zeros((len(la), hi - lo), dtype=np.float32)
            B = np.zeros((len(lb), hi - lo), dtype=np.float32)
            for i, d in enumerate(da):
                seg = d[(d >= lo) & (d < hi)] - lo
                A[i, seg] = 1.0
            for j, d in enumerate(db):
                seg = d[(d >= lo) & (d < hi)] - lo
                B[j, seg] = 1.0
            # float32 products are exact for counts < 2^24 per chunk
            inter += (A @ B.T).astype(np.int64)
        na = np.array([len(a) for a in la], dtype=np.int64)
        nb = np.array([len(b) for b in lb], dtype=np.int64)
        union = na[:, None] + nb[None, :] - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ia = lpdf["vid"].to_numpy()
        ib = rpdf["rvid"].to_numpy()
        keep = (jac >= threshold) & (ia[:, None] < ib[None, :])
        ii, jj = np.nonzero(keep)
        return pd.DataFrame(
            {"doc_a": ia[ii], "doc_b": ib[jj], "jaccard": jac[ii, jj]}
        )

    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("rba", "rbb"))
        .applyInPandas(tile, f"doc_a long, doc_b long, jaccard double")
    )


def _jaccard_shingle_join(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_salts: int | None = None,
) -> DataFrame:
    """Sparse-overlap path: candidate generation by prefix-filtered
    shingle-bucket join, exact verification.

    Candidate generation uses PPJoin-style **prefix filtering**: order
    each doc's shingles by global (frequency, shingle) and keep only
    the rarest ``⌊n·(1-t)⌋+1`` as its prefix — J(x,y) ≥ t requires the
    prefixes to share at least one shingle (two sets can disagree on at
    most n-⌈t·n⌉ leading elements of the canonical order and still
    overlap enough). Joining prefixes instead of full shingle sets
    removes the common-shingle bucket blow-up (' the ' never makes a
    prefix), which is the whole cost at scale; candidates are then
    verified with an exact intersection count, so the OUTPUT is
    identical to the naive all-collisions join and the DuckDB oracle is
    the naive formulation.

    Still exact and worst-case quadratic (all-identical corpora); the
    MinHash path below is the probabilistic sub-quadratic alternative.

    Skew: prefix filtering already demotes viral shingles (high df →
    last in the canonical order → rarely in a prefix), and AQE's
    skew-join splitting handles ordinary runtime imbalance. The
    pathological residue — short docs whose prefixes are FORCED to
    include a shared shingle because they have almost nothing rarer —
    concentrates one bucket's O(df²) candidate generation in one task;
    ``num_salts`` routes the bucket self-join through
    ``skew.salted_join`` so that bucket fans out over ``num_salts``
    tasks (identical output; the small side's shuffle volume ×
    num_salts is the price).
    """
    sh = char_shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    canon = Window.partitionBy(id_col).orderBy("df", "shingle")
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(canon))
        .join(sizes, id_col)
        .filter(
            F.col("rn")
            <= F.floor(F.col("n_shingles") * (1.0 - threshold)) + F.lit(1)
        )
        .select(id_col, "shingle")
    )
    if num_salts:
        from . import skew

        la = prefix.select(F.col(id_col).alias("doc_a"), "shingle")
        rb = prefix.select(F.col(id_col).alias("doc_b"), "shingle")
        joined = skew.salted_join(la, rb, ["shingle"], num_salts)
    else:
        a = prefix.alias("a")
        b = prefix.alias("b")
        joined = a.join(
            b, F.col("a.shingle") == F.col("b.shingle")
        ).select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    cand = (
        joined.filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verification sets come from the shuffle-free Arrow pass, not
    # another groupBy over sh — the exploded relation is only needed
    # for the frequency-ordered prefixes above. The lazy checkpoint
    # materializes the sets once for BOTH broadcast attach sides
    # (their per-side aliasing defeats ReuseExchange otherwise).
    sets = shingle_hash_sets(docs, n, text_col, id_col).localCheckpoint(
        eager=False
    )
    return _verify_candidate_sets(sets, cand, threshold, id_col)


def _verify_candidate_sets(
    sets: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (doc_a, doc_b):
    ``sets`` is (id_col, _shset array<long>) — per-doc 60-bit md5
    shingle fingerprint sets (same representation, and same negligible
    collision caveat, as the GEMM tile kernel, so sparse and dense
    paths agree exactly).

    Each side's set is attached as one array column (two equi-joins
    whose output stays at |candidates| rows) and the intersection is a
    per-row primitive-typed ``array_intersect`` — O(candidates × avg
    set size) with NO row inflation. The earlier formulation joined
    the candidate list against the exploded shingle table, multiplying
    the candidate count by the shingle-list length before aggregating;
    on a dense corpus (727k candidates × ~500 shingles at sf0.1) that
    was a ~360M-row intermediate for the same 256 output rows. At
    cluster scale both set-attach joins are plain equi-joins on the
    doc id (broadcastable when the per-doc set table fits; AQE
    decides). Callers pass a checkpointed or trivially-derivable
    relation — the two broadcast sides re-read it."""
    # Explicit-width repartition: the per-row intersect is the hot
    # compute; see _shuffle_parts for why AQE would otherwise run it
    # on 1-2 byte-sized partitions.
    cand = cand.repartition(_shuffle_parts(cand), "doc_a")
    inter = (
        cand.join(
            sets.select(
                F.col(id_col).alias("doc_a"), F.col("_shset").alias("_set_a")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("doc_b"), F.col("_shset").alias("_set_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_set_a", "_set_b")).alias("n_common"),
            F.size("_set_a").alias("_na"),
            F.size("_set_b").alias("_nb"),
        )
    )
    return (
        # n_common >= 1 keeps parity with the join-based formulation,
        # which never surfaced fully-disjoint pairs (relevant only at
        # threshold == 0).
        inter.filter(F.col("n_common") >= 1)
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("_na") + F.col("_nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_verified_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    num_hashes: int = 128,
    band_size: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_salts: int | None = None,
) -> DataFrame:
    """The sub-quadratic near-dup ladder end to end: MinHash+LSH
    banding proposes candidate pairs (collisions in ≥1 band — never
    all-pairs), exact Jaccard verifies them. Output rows are a
    RECALL-BOUNDED subset of ``jaccard_similar_pairs`` (a pair missed
    by every band is lost, P(miss) = (1-j^b)^(k/b)); precision is
    exact. This is the 100 TB default: every stage is a key-bounded
    join or a map-side-combinable aggregate.

    Default signature is 128 hashes in 32 bands of 4 — NOT the
    8×2 banding ``dedup_minhash_lsh`` demonstrates. Wide bands keep
    the candidate rate per band proportional to j⁴ background
    similarity (727k → 461k candidates on the synthetic sf0.1 corpus,
    whose ~50-word vocabulary pins background j near the threshold —
    the j⁴ gap widens by orders of magnitude on natural corpora, where
    background j is low) so the exact verification stage stays
    O(near-dups), while 32 bands hold recall at the threshold:
    P(detect | J=0.5) = 1-(1-0.5⁴)³² ≈ 0.87 and →1 fast above it
    (J=0.7: 0.9998).

    Plan shape: ONE fused zero-shuffle Arrow pass computes both the
    minhash signature and the 64-bit shingle-fingerprint set per doc
    (the md5 work is shared); the pass is lazily localCheckpoint-ed so
    banding and both verify-side set attaches re-read it instead of
    re-hashing the corpus."""
    combined = _sig_pass(
        docs, n, num_hashes, text_col, id_col, with_sets=True
    ).localCheckpoint(eager=False)
    cand = _pairs_from_sig(
        combined.drop("_shset"), num_hashes, band_size, id_col, num_salts
    )
    sets = combined.select(id_col, "_shset")
    return _verify_candidate_sets(sets, cand, threshold, id_col)


# Universal-hash family for MinHash: h_j(x) = (A[j]·(x mod P) + B[j]) mod P
# over the Mersenne prime P = 2^31 - 1. A/B are fixed md5-derived
# constants shared (as literals) with the DuckDB oracle, so the two
# engines compute the identical family. Keeping x mod P < 2^31 bounds
# A·x < 2^62 — no 64-bit overflow.
MINHASH_P = (1 << 31) - 1
MAX_NUM_HASHES = 128


def _minhash_constant(j: int, which: str) -> int:
    import hashlib

    h = int(hashlib.md5(f"{j}|{which}".encode()).hexdigest()[:15], 16)
    if which == "A":
        return h % (MINHASH_P - 1) + 1  # non-zero multiplier
    return h % MINHASH_P


MINHASH_A = [_minhash_constant(j, "A") for j in range(MAX_NUM_HASHES)]
MINHASH_B = [_minhash_constant(j, "B") for j in range(MAX_NUM_HASHES)]


def minhash_signature_sets(
    docs: DataFrame,
    n: int = 5,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``minhash_signatures`` PLUS the per-doc 60-bit shingle set
    (``_shset array<long>``) from ONE fused Arrow pass — the md5
    shingling is shared, so consumers that need both (the streaming
    near-dup admission: banding for retrieval, sets for exact
    verification) hash the corpus once instead of twice. Identical
    values to calling the two passes separately."""
    return _sig_pass(docs, n, num_hashes, text_col, id_col, with_sets=True)


def minhash_signatures(
    docs: DataFrame,
    n: int = 5,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Wide MinHash signatures: one row per doc with columns m0..m{k-1},
    m_j = min over shingles of (A[j]·(md5_long(shingle) mod P) + B[j])
    mod P.

    ONE shuffle-free Arrow pass: a document's signature depends only on
    its own text, so shingling, hashing, and the k-way affine min all
    happen inside ``mapInPandas`` — no explode, no groupBy exchange,
    embarrassingly parallel across input splits (the narrow repartition
    below only widens LOCAL inputs whose file count is under the
    session's core count; a real corpus already has more splits).
    The earlier JVM formulation (explode + one aggregate with
    ``num_hashes`` min() expressions) was algebraically identical but
    fell out of whole-stage codegen above ``spark.sql.codegen.maxFields``
    (default 100) — 128 interpreted aggregates over the exploded
    relation cost ~4× this pass. Hashes match ``md5_long`` exactly
    (first 15 hex chars of md5), so the DuckDB oracle mirror is
    unchanged: min over the raw shingle multiset equals min over the
    distinct set."""
    return _sig_pass(docs, n, num_hashes, text_col, id_col, with_sets=False)


def _sig_pass(
    docs: DataFrame,
    n: int,
    num_hashes: int,
    text_col: str,
    id_col: str,
    with_sets: bool,
) -> DataFrame:
    """Shared Arrow kernel behind ``minhash_signatures`` and
    ``minhash_verified_pairs``: per doc, the distinct character
    n-grams are md5-hashed ONCE; the signature is the k-way affine min
    over those hashes mod P, and (``with_sets``) the full 60-bit hash
    set is emitted alongside as ``_shset array<long>`` so exact
    verification reuses the hashing instead of re-exploding and
    re-hashing the corpus through two extra shuffles."""
    import hashlib

    import numpy as np
    import pandas as pd

    p = MINHASH_P
    a_vec = np.array(MINHASH_A[:num_hashes], dtype=np.int64)
    b_vec = np.array(MINHASH_B[:num_hashes], dtype=np.int64)
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, " + ", ".join(
        f"m{j} long" for j in range(num_hashes)
    )
    if with_sets:
        schema += ", _shset array<long>"

    def gen(batches):
        for pdf in batches:
            ids, sigs, sets = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < n:
                    continue
                shingles = {text[i : i + n] for i in range(len(text) - n + 1)}
                h60 = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                hx = h60 % p
                # hx < 2^31 and A < 2^31 keep the product under 2^62 —
                # exact in int64, mirroring the JVM/SQL arithmetic.
                sigs.append(((hx[:, None] * a_vec + b_vec) % p).min(axis=0))
                ids.append(did)
                if with_sets:
                    # np.unique: 60-bit fingerprints of the DISTINCT
                    # shingles (a collision would merge two — same
                    # convention, and same negligible odds, as the
                    # GEMM tile kernel).
                    sets.append(np.unique(h60))
            if not ids:
                continue
            out = pd.DataFrame(
                np.vstack(sigs), columns=[f"m{j}" for j in range(num_hashes)]
            )
            out.insert(0, id_col, ids)
            if with_sets:
                out["_shset"] = sets
            yield out

    src = docs.select(id_col, text_col)
    parts = _shuffle_parts(docs)
    if src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts)
    return src.mapInPandas(gen, schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 5,
    num_hashes: int = 16,
    band_size: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_salts: int | None = None,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b): docs whose signatures agree
    on every hash of at least one band.

    The only wide operations are the signature groupBy and the
    band-bucket self-join — candidates meet in
    O(num_hashes/band_size) buckets instead of all-pairs. The band
    key is a struct of the band's ``band_size`` minhash columns, so
    bucket membership is EXACT hash-tuple equality (no re-hash, no
    false buckets beyond genuine minhash agreement).

    Tuning note: the S-curve midpoint is (1/bands)^(1/band_size).
    band_size=2 with 8 bands centres at 0.35 but lets a
    high-background-similarity corpus flood the buckets (every pair
    with j≈0.1 collides somewhere at ~8·j² rate); 32 bands of 4
    centres at 0.42 with a j² → j⁴ false-candidate rate — the
    configuration ``minhash_verified_pairs`` uses at scale.
    """
    assert num_hashes % band_size == 0, "num_hashes must divide into bands"
    assert num_hashes <= MAX_NUM_HASHES
    sig = minhash_signatures(docs, n, num_hashes, text_col, id_col)
    return _pairs_from_sig(sig, num_hashes, band_size, id_col, num_salts)


def _pairs_from_sig(
    sig: DataFrame,
    num_hashes: int,
    band_size: int,
    id_col: str,
    num_salts: int | None = None,
) -> DataFrame:
    """Band-bucket self-join over a precomputed signature relation —
    split out so ``minhash_verified_pairs`` can feed it the fused
    sig+sets pass without recomputing signatures.

    ``num_salts`` routes the bucket self-join through
    ``skew.salted_join``, the same hot-bucket fallback the Jaccard
    prefix join has: a mass-duplicated corpus puts its m copies in the
    SAME (band, hk) bucket in every band, concentrating O(m²) pair
    generation in one task — salting fans each hot bucket's pair
    generation across ``num_salts`` tasks with identical output."""
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.struct(
                            *[
                                F.col(f"m{band_size * b + i}").alias(f"h{i}")
                                for i in range(band_size)
                            ]
                        ).alias("hk"),
                    )
                    for b in range(num_hashes // band_size)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.band", "bd.hk")
    # Explicit-width repartition on the bucket key: the self-join's
    # OUTPUT (bucket-size² pair rows) dwarfs its input, so AQE's
    # input-byte coalescing would run the pair generation nearly
    # single-task. Partitioning both sides identically also turns the
    # join into a co-partitioned local join (no further exchange).
    # The lazy localCheckpoint materializes the band relation ONCE —
    # without it each side of the self-join re-runs the whole
    # shingle-explode + num_hashes-way min aggregate upstream (swap
    # for reliable checkpoint() where executor loss must be
    # recoverable, as with connected_components below).
    bands = bands.repartition(
        _shuffle_parts(bands), "band", "hk"
    ).localCheckpoint(eager=False)
    if num_salts:
        from . import skew

        la = bands.select(F.col(id_col).alias("doc_a"), "band", "hk")
        rb = bands.select(F.col(id_col).alias("doc_b"), "band", "hk")
        joined = skew.salted_join(la, rb, ["band", "hk"], num_salts)
    else:
        a = bands.alias("a")
        b = bands.alias("b")
        joined = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.hk") == F.col("b.hk")),
        ).select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    return (
        joined.filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def band_keys(
    sig: DataFrame,
    num_hashes: int,
    band_size: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, band_khash): ONE 60-bit md5 key per LSH band, folding
    the (band index, hash tuple) pair into a single long column — the
    representation a persisted band INDEX wants (streaming near-dup
    admission claims these keys with an insert-if-absent sink). The
    band index rides inside the hash so keys from different bands
    never alias."""
    assert num_hashes % band_size == 0
    keys = [
        md5_long(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col(f"m{band_size * b + i}").cast("string")
                    for i in range(band_size)
                ],
            )
        )
        for b in range(num_hashes // band_size)
    ]
    return sig.select(
        id_col, F.explode(F.array(*keys)).alias("band_khash")
    )


# Edge-count bound for the fused single-task CC kernel: 4M undirected
# edges ≈ 64 MB of int64 pairs in one Arrow batch — comfortably one
# task. Above it, the iterative min-label loop runs instead.
CC_FUSED_MAX_EDGES = 4_000_000


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
    fused_max_edges: int = CC_FUSED_MAX_EDGES,
) -> DataFrame:
    """Connected components of a pair graph, cost-based like the
    Jaccard family: a VERIFIED near-dup pair list is orders of
    magnitude smaller than its corpus, so when the (deduplicated,
    undirected) edge list fits one Arrow batch
    (``fused_max_edges``) the components come from a single
    executor-side union-find task — ONE job instead of
    2·diameter iterative jobs. Larger graphs take the iterative
    min-label propagation below (the DataFrame form of Pregel CC,
    what GraphFrames runs), whose per-round cost is one shuffle and
    whose round count is the graph diameter — near-dup clusters are
    near-cliques, 2–4 rounds in practice, bounded by
    ``max_iterations`` against adversarial chains. Labels are
    ``localCheckpoint``-ed each round to truncate the iterative
    lineage (swap for reliable ``checkpoint`` on a cluster where
    executor loss must be recoverable).

    Both paths are deterministic and identical: every vertex maps to
    the MINIMUM vertex id reachable from it (union-find tracks the
    min per root; min-label converges to the same fixpoint). Returns
    (vertex, component) for every NON-NULL vertex that appears in a
    pair; pairs containing a NULL id are dropped up front (a NULL id
    is not a vertex — under SQL null-join semantics it could never
    propagate a label anyway, and letting it reach the union-find
    kernel would alias pandas' -1 factorize code to a real vertex).
    """
    clean = pairs.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
    und = (
        clean.select(
            F.least(src, dst).alias("_v"), F.greatest(src, dst).alias("_w")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Cost probe over the UNDIRECTED deduplicated pair list — the
    # unit the documented bound is stated in. The count materializes
    # the checkpoint either way (same pattern as the GEMM_MAX_DOCS
    # strategy guard). ``fused_max_edges <= 0`` means "iterative
    # only" and skips the probe entirely — a caller that KNOWS its
    # graph is large shouldn't pay a full edge-list pass to learn so.
    if fused_max_edges > 0 and und.count() <= fused_max_edges:
        return _cc_fused(und, pairs.schema[src].dataType)
    edges = und.unionByName(
        und.select(F.col("_w").alias("_v"), F.col("_v").alias("_w"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("_v").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["_v"] == labels["vertex"])
            .groupBy(F.col("_w").alias("vertex"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        # The per-vertex change flag rides inside the checkpointed
        # frame, so the convergence probe below is a scan of
        # already-materialized data — one Spark job per round, not two.
        flagged = (
            labels.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("_nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = flagged.select("vertex", "component")
        if not flagged.filter("_changed").head(1):
            break
    return labels


def _cc_fused(edges: DataFrame, vertex_type) -> DataFrame:
    """Single-task union-find over a bounded UNDIRECTED deduplicated
    pair list (one orientation per edge, nulls pre-filtered): all
    pairs gather into ONE ``applyInPandas`` group (an executor task,
    not the driver), roots track their component's minimum id,
    path-halving keeps finds near-O(1). Output contract matches the
    iterative path exactly: (vertex, component = min reachable id),
    one row per distinct vertex. Works for any orderable id type (ids
    are factorized to dense codes; the min is taken over original
    values).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("vertex", vertex_type),
            T.StructField("component", vertex_type),
        ]
    )

    def unite(pdf):
        import numpy as np
        import pandas as pd

        if pdf.empty:
            return pd.DataFrame({"vertex": [], "component": []})
        codes_v, uniques = pd.factorize(
            pd.concat([pdf["_v"], pdf["_w"]], ignore_index=True)
        )
        n = len(uniques)
        half = len(pdf)
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(codes_v[:half], codes_v[half:]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots = np.fromiter(
            (find(i) for i in range(n)), dtype=np.int64, count=n
        )
        comp_min = (
            pd.Series(uniques, dtype=pdf["_v"].dtype)
            .groupby(roots)
            .transform("min")
        )
        return pd.DataFrame({"vertex": uniques, "component": comp_min})

    return edges.groupBy(F.lit(0).alias("_g")).applyInPandas(
        unite, out_schema
    )


def neardup_keepers(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keeper assignment for the WHOLE corpus from near-dup pairs:
    (doc_id, keeper_doc_id) where keeper = the minimum id in the doc's
    near-dup component; docs in no pair keep themselves. This is the
    last step of every dedup pipeline — ``filter(doc_id ==
    keeper_doc_id)`` yields the deduplicated corpus."""
    cc = connected_components(pairs, max_iterations=20)
    return (
        docs.select(id_col)
        .join(cc.withColumnRenamed("vertex", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("keeper_doc_id"),
        )
    )


def neardup_keepers_by_score(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keeper assignment with a QUALITY policy: within each near-dup
    component the keeper is the member with the highest ``score_col``
    (ties -> minimum id), instead of ``neardup_keepers``' arbitrary
    min-id. This is the "keep the best copy" rule production curation
    uses — the longest duplicate, the highest quality-classifier
    score, the lowest perplexity — so dedup stops deleting the good
    copy of a pair whose ids happen to be ordered badly.

    ``score_col`` must be non-null (coalesce a default upstream).
    Plan shape: the component walk is shared ``connected_components``
    machinery; the argmax is ONE max-of-struct aggregate per component
    ((score, -id) lexicographic max = score desc, id asc — no window,
    no sort) plus a component-keyed join back. Returns
    (id, keeper_doc_id); unpaired docs keep themselves."""
    cc = connected_components(pairs, max_iterations=20)
    member = (
        docs.select(id_col, score_col)
        .join(cc.withColumnRenamed("vertex", id_col), id_col, "left")
        .withColumn(
            "component", F.coalesce(F.col("component"), F.col(id_col))
        )
        .localCheckpoint(eager=False)
    )
    best = (
        member.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("s"),
                    (-F.col(id_col)).cast("long").alias("nid"),
                )
            ).alias("_b")
        )
        .select(
            "component",
            (-F.col("_b.nid")).cast("long").alias("keeper_doc_id"),
        )
    )
    return member.join(best, "component").select(id_col, "keeper_doc_id")


def simhash_fingerprints(
    docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash fingerprint per doc over whitespace tokens (every
    occurrence weighted): bit b is set iff sum over tokens of
    (+1 if bit b of md5_long(token) else -1) > 0.

    The default width is 32 — the at-scale configuration: 16 bits is
    too coarse on dup-saturated corpora (bucket collisions swamp the
    banded retrieval); it stays reachable for demos via ``bits=16``.
    Width is capped at 63: the fingerprint lives in a signed long, and
    at 64 bits the sign bit breaks the div/mod band decomposition in
    ``simhash_near_pairs`` (negative band values, broken bucketing).

    Plan shape: one token explode, ONE hash aggregate with ``bits``
    conditional sums — no per-bit row explosion (a bits× blow-up) and
    md5 computed once per token row (codegen CSE). The per-bit counts
    `s_b` then fold into the fingerprint in a final projection. At
    100 TB: a narrow map + single map-side-combinable groupBy(doc_id).
    Result is bit-identical to the per-bit-explode formulation, so the
    DuckDB oracle is unchanged."""
    if not 0 < bits <= 63:
        raise ValueError(
            f"bits ({bits}) must be in 1..63: the fingerprint is a "
            "signed long, and bit 63 (the sign bit) would make the "
            "band decomposition produce negative band values"
        )
    toks = docs.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    # s_b = (#tokens with bit b set) - (#tokens with bit b unset)
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"(h div {1 << b}) % 2") == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fingerprint = sum(
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0) for b in range(bits)
    )
    return sums.select(id_col, fingerprint.cast("long").alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash retrieval: banded bucketing over the fingerprints, then
    exact hamming verification — pairs (doc_a < doc_b) with
    ``bit_count(fp_a XOR fp_b) <= max_hamming``.

    Pigeonhole guarantee: a pair within hamming ``bands - 1`` differs
    in at most ``bands - 1`` bit positions, so at least one of the
    ``bands`` disjoint bit-bands is INTACT and the pair collides in
    that band's bucket — full recall for ``max_hamming <= bands - 1``
    (the default 3 at 4 bands). Larger thresholds remain supported but
    are recall-bounded by the banding (same contract as MinHash LSH).
    Precision is exact: every candidate is verified.

    Plan shape: fingerprints from the single-aggregate SimHash pass,
    a narrow ``bands``-per-doc explode, a key-bounded bucket
    self-join (never all-pairs), and a per-row ``bit_count`` verify —
    the same retrieve-verify ladder as the MinHash family at a
    fraction of the signature cost (one 64-bit fingerprint vs 128
    mins)."""
    fp = simhash_fingerprints(docs, bits, text_col, id_col).localCheckpoint(
        eager=False
    )
    return hamming_near_pairs(fp, "simhash", bits, bands, max_hamming, id_col)


def hamming_near_pairs(
    fps: DataFrame,
    fp_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded hamming retrieval over ANY integer fingerprint column —
    the shared core of ``simhash_near_pairs`` (text) and
    ``multimodal.image_dhash_pairs`` (perceptual image hashes): band
    bucketing, key-bounded bucket self-join, exact ``bit_count``
    verification. Pairs (doc_a < doc_b) with
    ``bit_count(fp_a XOR fp_b) <= max_hamming``; full recall for
    ``max_hamming <= bands - 1`` (pigeonhole — see
    ``simhash_near_pairs``), precision exact always."""
    if not 0 < bits <= 63:
        raise ValueError(
            f"bits ({bits}) must be in 1..63: at 64 the signed long's "
            "sign bit makes the div/mod band decomposition produce "
            "negative band values and broken bucketing"
        )
    if bits % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide bits ({bits}): an uneven "
            "decomposition leaves high bits unbanded and silently "
            "voids the pigeonhole recall guarantee"
        )
    width = bits // bands
    bcols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"({fp_col} div {1 << (i * width)}) % {1 << width}").alias(
                    "val"
                ),
            )
            for i in range(bands)
        ]
    )
    keys = fps.select(
        F.col(id_col), F.col(fp_col), F.explode(bcols).alias("b")
    ).select(
        id_col, fp_col, F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col(f"a.{fp_col}").alias("_fa"),
            F.col(f"b.{fp_col}").alias("_fb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.expr("_fa ^ _fb"))
    return (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# Decontamination broadcasts the eval set's distinct gram hashes to
# every executor: 10M int64 hashes ≈ 80 MB serialized — about the
# ceiling of a comfortable Spark broadcast. The collect() is safe only
# because the eval side is benchmark-sized BY CONTRACT; the guard
# turns a violated contract into an error instead of a driver OOM.
MAX_EVAL_GRAMS = 10_000_000


def broadcast_eval_grams(
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_grams: int = MAX_EVAL_GRAMS,
):
    """Collect the eval set's distinct gram hashes + member ids and
    broadcast them once. Returns an opaque state usable across MANY
    ``ngram_decontaminate`` calls — the hoist a streaming pipeline
    needs so each micro-batch reuses one broadcast instead of
    re-collecting the (static) eval set per trigger.

    Raises ``ValueError`` when the eval set exceeds ``max_grams``
    distinct gram hashes (default 10M ≈ 80 MB broadcast): a caller
    passing a corpus-sized "eval" relation gets an actionable error,
    not a driver OOM. Flip the two sides (decontaminate the SMALL set
    against the big one) or raise the bound explicitly if the workers
    can take the broadcast."""
    grams = (
        char_shingles(eval_docs, n, text_col, id_col, distinct=False)
        .select(md5_long(F.col("shingle")).alias("_g"))
        .distinct()
    )
    n_grams = grams.count()
    if n_grams > max_grams:
        raise ValueError(
            f"eval set has {n_grams:,} distinct {n}-gram hashes, above the "
            f"{max_grams:,} broadcast bound (~{8 * max_grams // 2**20} MB). "
            "ngram_decontaminate broadcasts the EVAL side; pass the "
            "benchmark-sized relation as eval_docs, or raise max_grams "
            "deliberately."
        )
    eval_grams_rows = grams.collect()
    eval_ids_rows = eval_docs.select(id_col).collect()
    sc = eval_docs.sparkSession.sparkContext
    bc_grams = sc.broadcast(sorted(r["_g"] for r in eval_grams_rows))
    bc_eval_ids = sc.broadcast(frozenset(r[id_col] for r in eval_ids_rows))
    return n, bc_grams, bc_eval_ids


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = 8,
    min_overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_state=None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least ``min_overlap`` distinct character ``n``-grams with an
    evaluation set — the standard leakage guard an LLM training
    pipeline runs before a corpus ships.

    Plan shape (the 100 TB asymmetry is the point): the EVAL side is
    benchmark-sized by definition, so its distinct gram-hash set is
    collected once and broadcast to the workers (pass a prepared
    ``eval_state`` from :func:`broadcast_eval_grams` to amortize that
    across calls — e.g. per micro-batch in a stream); the corpus side
    is a single shuffle-free Arrow ``mapInPandas`` pass that builds
    each document's distinct gram set and intersects it with the
    broadcast set (vectorized ``np.isin``) — the corpus is never
    exchanged at all, not even a dropDuplicates. Gram identity is the
    60-bit md5 prefix (same collision bound as the Jaccard GEMM path;
    hashing in Python matches Spark's ``md5`` and DuckDB's
    byte-for-byte on utf-8). Rows: (doc_id, is_eval, n_grams,
    n_overlap, contaminated) for EVERY corpus doc (gram-less short
    docs included with zero counts); eval members themselves are never
    flagged.
    """
    import hashlib

    if eval_state is None:
        if eval_docs is None:
            raise ValueError("pass eval_docs or a prepared eval_state")
        eval_state = broadcast_eval_grams(eval_docs, n, text_col, id_col)
    state_n, bc_grams, bc_eval_ids = eval_state
    if state_n != n:
        raise ValueError(
            f"eval_state was built for n={state_n}, called with n={n}"
        )

    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    # The id column passes through untouched, so the output schema
    # carries ITS type (string/int/long/... ids all work); the pandas
    # series dtype follows suit — int64 only for integral ids.
    id_type = docs.schema[id_col].dataType
    id_is_integral = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("is_eval", T.BooleanType()),
            T.StructField("n_grams", T.LongType()),
            T.StructField("n_overlap", T.LongType()),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ev = np.asarray(bc_grams.value, dtype=np.int64)
        ev_ids = bc_eval_ids.value
        for pdf in batches:
            ids, evflag, ng, no, flag = [], [], [], [], []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                if s is None or len(s) < n:
                    hashes = np.empty(0, dtype=np.int64)
                else:
                    grams = {s[i : i + n] for i in range(len(s) - n + 1)}
                    # unique at the HASH level (not just gram strings)
                    # to mirror the oracle's DISTINCT over hash values
                    hashes = np.unique(
                        np.fromiter(
                            (
                                int(
                                    hashlib.md5(
                                        g.encode("utf-8")
                                    ).hexdigest()[:15],
                                    16,
                                )
                                for g in grams
                            ),
                            dtype=np.int64,
                            count=len(grams),
                        )
                    )
                # membership by binary search against the PRE-SORTED
                # broadcast (broadcast_eval_grams sorts once): np.isin
                # re-sorts its second argument on EVERY call — an
                # O(|ev| log |ev|) per-document constant that
                # scalecheck.py measured as 1.4x super-linear growth
                # at 80k docs.
                idx = np.searchsorted(ev, hashes)
                valid = idx < len(ev)
                overlap = int((ev[idx[valid]] == hashes[valid]).sum())
                is_ev = did in ev_ids
                ids.append(did)
                evflag.append(is_ev)
                ng.append(len(hashes))
                no.append(overlap)
                flag.append((not is_ev) and overlap >= min_overlap)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(
                        ids, dtype="int64" if id_is_integral else "object"
                    ),
                    "is_eval": pd.Series(evflag, dtype="bool"),
                    "n_grams": pd.Series(ng, dtype="int64"),
                    "n_overlap": pd.Series(no, dtype="int64"),
                    "contaminated": pd.Series(flag, dtype="bool"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, out_schema)


# Second Rabin-Karp modulus for span gram ids: combined with
# functions.text.ROLL_MOD as h1*M2+h2 the id space is ~2^60 (M1*M2 <
# 2^63 keeps the combination in BIGINT on both engines).
SPAN_HASH_MOD2 = 998_244_353


def span_gram_occurrences(
    tk: DataFrame, span_tokens: int, id_col: str = "doc_id"
) -> DataFrame:
    """Every ``span_tokens``-wide token window as an occurrence row
    (id, pos, gh) — the ExactSubstr gram relation, shared by the batch
    span cutter and the streaming admission surface.

    ``tk`` is (id, _tk array<string>). Per-token 60-bit md5 ids are
    computed ONCE in the JVM (native md5, O(text bytes) total); the
    Arrow stage receives only the int64 array and runs the
    double-modulus polynomial fold as ``span_tokens`` vectorized
    numpy passes — h = (h·B + t) mod M per step, exact in int64
    (h·B < 2^38, t < 2^60). No per-window string concat, no
    per-window md5."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..functions.text import ROLL_BASE, ROLL_MOD

    id_type = tk.schema[id_col].dataType.simpleString()
    ti = tk.select(
        id_col,
        F.transform("_tk", lambda t: md5_long(t)).alias("_ti"),
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            poss: list = []
            ghs: list = []
            for did, tok_ids in zip(pdf[id_col], pdf["_ti"]):
                if tok_ids is None:  # NULL text: nothing to hash — the
                    continue  # doc passes through whole, uncut
                nwin = len(tok_ids) - span_tokens + 1
                if nwin <= 0:
                    continue
                t = np.asarray(tok_ids, dtype=np.int64)
                h1 = np.zeros(nwin, dtype=np.int64)
                h2 = np.zeros(nwin, dtype=np.int64)
                for j in range(span_tokens):
                    seg = t[j : j + nwin]
                    h1 = (h1 * ROLL_BASE + seg) % ROLL_MOD
                    h2 = (h2 * ROLL_BASE + seg) % SPAN_HASH_MOD2
                ids.extend([did] * nwin)
                poss.extend(range(nwin))
                ghs.append(h1 * SPAN_HASH_MOD2 + h2)
            gh = (
                np.concatenate(ghs)
                if ghs
                else np.array([], dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "pos": pd.Series(poss, dtype="int32"),
                    "gh": pd.Series(gh, dtype="int64"),
                }
            )

    return ti.mapInPandas(fold, f"{id_col} {id_type}, pos int, gh long")


def remove_duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr deduplication proper (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", 2022): CUT duplicated
    token spans out of the text instead of flagging whole documents —
    the operator ``interdoc_dup_stats`` only reports on.

    Semantics, token-granular and deterministic:
    - every window of ``span_tokens`` consecutive tokens is a gram
      occurrence (doc, start position);
    - a gram occurring more than once corpus-wide keeps exactly its
      CANONICAL occurrence (lexicographically minimal (doc_id, pos) —
      Lee et al.'s "keep one copy") and every other occurrence is cut;
    - a token is removed iff some cut occurrence covers it; the
      surviving tokens re-join with single spaces.
    Corollaries (tested): a corpus of distinct docs passes through
    unchanged; of two identical docs, the lower id survives verbatim
    and the higher id empties; a paragraph shared by two docs survives
    only in the earlier one.

    Plan shape: gram ids come from the Rabin-Karp rolling-hash kernel
    (the ``bottomk_sketch`` pattern): each token is md5-hashed ONCE in
    the JVM (O(text bytes) total, vs the old per-window
    md5-of-concatenation's O(tokens × span) bytes hashed), and the
    per-window polynomial fold runs as span-step vectorized numpy
    passes in ONE Arrow ``mapInPandas`` stage — no explode until the
    occurrence relation. Two moduli fold simultaneously and combine
    as ``h1·M2 + h2`` (~2^60 id space), so collision odds match the
    old 60-bit md5 ids — this operator CUTS text, so a gram-id
    collision is a false-positive cut, not a sketch artifact. The
    occurrence stats are ONE map-side-combinable groupBy(gram hash)
    carrying count + min-struct canonical; cut coverage explodes ONLY
    the cut occurrences (≤ span_tokens× their count); reassembly is
    one groupBy(doc). The stats join is a shuffle on the uniform
    combined hash, skew-free by construction.

    Returns (id, clean_text, n_tokens, n_removed) for EVERY input doc
    (docs shorter than ``span_tokens`` pass through whole).
    """
    if span_tokens < 2:
        raise ValueError(f"span_tokens ({span_tokens}) must be >= 2")
    tk = docs.select(id_col, tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    occ = span_gram_occurrences(tk, span_tokens, id_col)
    stats = occ.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_canon"),
    )
    cut = occ.join(stats, "gh").filter(
        (F.col("_c") > 1)
        & ~(
            (F.col(id_col) == F.col(f"_canon.{id_col}"))
            & (F.col("pos") == F.col("_canon.pos"))
        )
    )
    return cut_spans_and_reassemble(tk, cut, span_tokens, id_col)


def cut_spans_and_reassemble(
    tk: DataFrame, cut: DataFrame, span_tokens: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, clean_text, n_tokens, n_removed) for EVERY doc in ``tk``
    given the cut occurrence relation (id, pos): explode cut spans to
    covered token positions (bounded by span_tokens × |cut|), anti-join
    the token positions, re-join survivors with single spaces. Shared
    by the batch span cutter and the streaming admission surface so
    their text reassembly cannot drift."""
    n = F.size("_tk")
    covered = (
        cut.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + span_tokens - 1)
            ).alias("cpos"),
        )
        .distinct()
    )
    tokpos = tk.select(
        id_col, F.posexplode("_tk").alias("pos", "tok")
    )
    kept = tokpos.join(
        covered,
        (tokpos[id_col] == covered[id_col])
        & (tokpos["pos"] == covered["cpos"]),
        "left_anti",
    )
    agg = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    return (
        tk.join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            n.cast("long").alias("n_tokens"),
            (n - F.coalesce("_n_kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
        )
    )


def split_leakage_report(
    docs: DataFrame,
    split_plan: DataFrame,
    span_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_label: str = "train",
) -> DataFrame:
    """Train/eval SPLIT-LEAKAGE measurement: for every non-train
    split, how many of its docs share at least one ``span_tokens``
    consecutive-token gram with ANY train doc. Internal-split
    contamination is the blind spot of external-benchmark
    decontamination (``ngram_decontaminate`` guards against a known
    eval SET; a val split carved from a near-dup-laden corpus leaks
    against its own train half) — this is the report that says
    whether the split is trustworthy BEFORE training.

    Plan shape: gram ids from the shared Rabin-Karp kernel
    (``span_gram_occurrences`` — O(text bytes), no per-window
    hashing); the train-gram relation is DISTINCT gram ids only
    (bounded by corpus grams); leakage is one semi-join on the
    uniform 60-bit combined hash + one distinct + one count per
    split. No all-pairs anywhere; leak rate is an exact integer
    permille.

    Returns (split, n_docs, n_leaky_docs, leak_permille), one row per
    non-train split in ``split_plan`` (docs too short to have any
    gram count in n_docs and cannot leak).
    """
    tk = docs.select(id_col, tokens(F.col(text_col)).alias("_tk"))
    occ = (
        span_gram_occurrences(tk, span_tokens, id_col)
        .select(id_col, "gh")
        .join(split_plan, id_col)
        .localCheckpoint(eager=False)
    )
    train_grams = (
        occ.filter(F.col("split") == train_label).select("gh").distinct()
    )
    leaky = (
        occ.filter(F.col("split") != train_label)
        .join(train_grams, "gh", "left_semi")
        .select(id_col, "split")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_leaky_docs"))
    )
    totals = (
        split_plan.filter(F.col("split") != train_label)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return totals.join(leaky, "split", "left").select(
        "split",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n_leaky_docs", F.lit(0)).cast("long").alias(
            "n_leaky_docs"
        ),
        F.expr(
            "(coalesce(n_leaky_docs, 0) * 1000) div n_docs"
        ).cast("long").alias("leak_permille"),
    )


def segment_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmenter: str = "lines",
    words_per_segment: int = 8,
) -> DataFrame:
    """(id, seg_idx, seg): one row per non-empty segment of each doc.

    Two segmenters, both pure column expressions (no Python, no
    shuffle — segments are derived per input row and only then
    exploded):

    - ``"lines"``: split on newlines, drop blank lines — the unit
      line-level dedup operates on in web-corpus curation (RefinedWeb
      §"line-wise corrections"; CCNet's paragraph hashing).
    - ``"words"``: fixed windows of ``words_per_segment`` whitespace
      tokens — the surrogate unit for corpora whose documents carry no
      newlines (this repo's testdata), and the frame unit the video
      perceptual-hash path reuses (each window = one "frame" of the
      payload).
    """
    segs = segment_array(F.col(text_col), segmenter, words_per_segment)
    return docs.select(
        id_col, F.posexplode(segs).alias("seg_idx", "seg")
    )


def segment_array(
    text: Column,
    segmenter: str = "lines",
    words_per_segment: int = 8,
) -> Column:
    """The per-row segment array both segmenters compile to — a pure
    column expression (no explode, no shuffle) shared by
    ``segment_documents`` and the operators that filter segments in
    place without ever leaving the row (``text_profile.c4_clean``)."""
    if segmenter == "lines":
        return F.filter(F.split(text, "\n"), lambda s: F.trim(s) != "")
    if segmenter == "words":
        k = words_per_segment
        if k < 1:
            raise ValueError(f"words_per_segment ({k}) must be >= 1")

        # Bind the token array to a LAMBDA VARIABLE before windowing:
        # HOF lambdas re-evaluate inlined outer expressions per
        # element (no subexpression elimination inside the lambda), so
        # referencing tokens(text) directly in the window lambda
        # re-ran the split once per segment — O(tokens²/k) work per
        # row. transform(array(tokens), ...) evaluates the tokenize
        # ONCE and the inner lambda sees a bound reference. This stays
        # a pure column expression, which segment_array's callers
        # (c4_clean et al.) require.
        def _segments_of(w: Column) -> Column:
            nseg = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
            return F.when(
                F.size(w) > 0,
                F.transform(
                    F.sequence(F.lit(0), nseg - 1),
                    lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))

        return F.element_at(
            F.transform(F.array(tokens(text)), _segments_of), 1
        )
    raise ValueError(
        f"unknown segmenter {segmenter!r}: expected 'lines' or 'words'"
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    segmenter: str = "lines",
    words_per_segment: int = 8,
) -> DataFrame:
    """Line/segment-level deduplication (boilerplate removal): cut
    every segment whose exact text occurs in >= ``min_docs`` DISTINCT
    documents, keeping NO copy — the RefinedWeb/CCNet treatment of
    navigation bars, cookie banners and license headers, which repeat
    across unrelated pages and survive document-level dedup untouched.
    (Contrast ``remove_duplicate_spans``, which keeps one canonical
    copy of within-corpus duplicated spans; boilerplate is noise in
    every copy.)

    Plan shape (scales to 100 TB):
    - segmentation is a narrow per-row expression (``segment_documents``)
      — the explode multiplies rows but never shuffles;
    - the doc-frequency relation is ONE groupBy on the 60-bit segment
      hash (map-side combinable count-distinct);
    - only fingerprints with doc_freq >= min_docs survive the filter —
      the boilerplate relation is the heavy-tailed HEAD of the segment
      distribution, orders of magnitude smaller than the corpus, and
      joins back as a LEFT ANTI on the uniform hash key (skew-free);
    - reassembly is one groupBy(doc) ordered-struct rejoin — the same
      kernel ``cut_spans_and_reassemble`` uses.

    Returns (id, clean_text, n_segments, n_removed) for EVERY input
    doc; a doc whose segments were all boilerplate comes back with
    clean_text '' (downstream length gates drop it).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs ({min_docs}) must be >= 2")
    sep = "\n" if segmenter == "lines" else " "
    # The fingerprinted segment relation feeds THREE consumers (the
    # doc-frequency aggregate, the anti-join left side, the per-doc
    # totals); the lazy checkpoint materializes the explode once
    # instead of re-scanning and re-exploding the corpus per consumer
    # (the image_dhash_pairs discipline).
    segs = (
        segment_documents(docs, text_col, id_col, segmenter, words_per_segment)
        .withColumn("_fp", md5_long(F.col("seg")))
        .localCheckpoint(eager=False)
    )
    boiler = (
        segs.groupBy("_fp")
        .agg(F.count_distinct(F.col(id_col)).alias("_n_docs"))
        .filter(F.col("_n_docs") >= min_docs)
        .select("_fp")
    )
    kept = segs.join(boiler, "_fp", "left_anti")
    return reassemble_kept_segments(docs.select(id_col), segs, kept, sep, id_col)


def reassemble_kept_segments(
    base: DataFrame,
    segs: DataFrame,
    kept: DataFrame,
    sep: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, clean_text, n_segments, n_removed) for EVERY id in
    ``base`` given the full and surviving segment relations — the
    segment-granular sibling of ``cut_spans_and_reassemble``, shared
    by batch ``line_dedup`` and the streaming admission twin so their
    reassembly cannot drift. Docs with no surviving (or no) segments
    come back with clean_text ''."""
    agg = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = segs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_segments")
    )
    return (
        base.join(totals, id_col, "left")
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("_n_segments", F.lit(0)).cast("long").alias(
                "n_segments"
            ),
            (
                F.coalesce("_n_segments", F.lit(0))
                - F.coalesce("_n_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def intradoc_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmenter: str = "lines",
    words_per_segment: int = 8,
) -> DataFrame:
    """WITHIN-document repeated-segment removal: every segment keeps
    only its FIRST occurrence inside its own document (min seg_idx per
    (doc, fingerprint)); later repeats are cut. This is the per-page
    duplicate-paragraph correction web curation applies BEFORE any
    cross-doc dedup (CCNet dedups paragraphs; Gopher's repetition
    RULES gate on the same signal but drop whole docs — this operator
    repairs the doc instead). Orthogonal to ``line_dedup``: that cuts
    cross-doc boilerplate with NO keeper copy; this keeps one canonical
    copy per doc and never looks outside the doc.

    Plan shape: segmentation is the shared per-row expression; the
    keep-first rule is ONE map-side-combinable min-of-struct aggregate
    on (id, 60-bit segment hash) — uniform keys, skew-free, no window,
    no sort; reassembly is the shared ordered-struct kernel. Per-doc
    state never exceeds the doc's own segment count, so the operator
    runs at 100 TB as two hash aggregates.

    Returns (id, clean_text, n_segments, n_removed) for EVERY input
    doc (reference parity note: the reference has no sub-document
    operators at all — this extends SURVEY §2.12's gap list on the
    Spark surface)."""
    sep = "\n" if segmenter == "lines" else " "
    segs = segment_documents(
        docs, text_col, id_col, segmenter, words_per_segment
    )
    first = (
        segs.groupBy(id_col, md5_long(F.col("seg")).alias("_fp"))
        .agg(F.min(F.struct("seg_idx", "seg")).alias("_m"))
        .select(
            id_col,
            F.col("_m.seg_idx").alias("seg_idx"),
            F.col("_m.seg").alias("seg"),
        )
    )
    return reassemble_kept_segments(
        docs.select(id_col), segs, first, sep, id_col
    )


def soft_dedup_weights(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    scale: int = 1000,
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, assign
    every document a training weight inversely proportional to its
    near-dup multiplicity — weight = scale div component_size in exact
    integer arithmetic (SoftDedup: down-weighting repeated content
    preserves coverage while removing the over-sampling bias; a
    singleton keeps full weight ``scale``, a 4-clone family carries
    ``scale`` total across its members up to integer floor).

    Built on the same connected components as ``neardup_keepers`` plus
    ONE count aggregate on the keeper id and one join back — both on
    uniform id keys. Returns (id, keeper_doc_id, group_size,
    weight_permille) for EVERY doc; the column keeps its permille name
    for the contract even when a caller rescales ``scale``."""
    if scale < 1:
        raise ValueError(f"scale ({scale}) must be >= 1")
    keepers = neardup_keepers(docs, pairs, id_col)
    sizes = keepers.groupBy("keeper_doc_id").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return keepers.join(sizes, "keeper_doc_id").select(
        id_col,
        "keeper_doc_id",
        F.col("group_size").cast("long").alias("group_size"),
        F.expr(f"CAST({scale} div group_size AS BIGINT)").alias(
            "weight_permille"
        ),
    )
