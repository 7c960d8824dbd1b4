"""Product quantization (PQ) for the embedding index: trained
per-subvector codebooks, m×code compression, and IVF-PQ search with
asymmetric-distance (ADC) scoring.

Why this exists: every other ANN path here (LSH, IVF, the streaming
IVF index) stores the full quantized vector per indexed row, so index
storage is O(corpus × dim) — at 100 TB of embeddings the index IS the
corpus. PQ stores ``m`` small codes (one byte each at ksub=256) plus
one stored norm per vector: a 64-dim float vector (256 B) becomes
m=4..16 bytes of codes + 8 B of norm — 10-30× smaller — while ADC
scoring needs only a per-query lookup table of m×ksub precomputed
dot products. This is the standard IVF-PQ design (Jégou et al., "
Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
same layout FAISS's ``IVFx,PQy`` uses with by_residual disabled).

Design decisions, all in service of the repo's determinism doctrine
(bit-exact DuckDB oracles):

- Codebooks are trained with the SAME integer-exact distributed
  Lloyd's iteration as the coarse quantizer (``_kmeans_iterate``) —
  one run per subspace over the sliced micro-unit vectors, seeded
  from the ksub smallest md5(id||'|seed') ids (content-spread,
  deterministic — similarity._seed_key). Integer centroids mean the
  encode argmin and the ADC lookup table are integer-exact too.
- BOTH encodings are implemented: ``pq_codebooks``/``pq_encode``
  encode the RAW vector (FAISS ``by_residual=false`` — quantizers
  stay independent, codes answer queries under ANY cell layout),
  and ``pq_codebooks_residual``/``pq_encode_residual``/
  ``ann_ivfpq_res_topk`` encode the residual against the coarse
  centroid (FAISS's default ``by_residual=true`` — tighter
  distribution per codeword, coupled to the coarse quantizer). The
  accuracy trade is measured, not guessed: ``ann_recall_report``
  pins both beside the exact/LSH/IVF variants (on the near-uniform
  synthetic corpus they tie — residual's win materializes on
  naturally CLUSTERED embeddings, where residual norms are far
  below vector norms; the report re-measures on whatever corpus it
  is pointed at).
- Norms are stored per vector (8 B): cosine needs ``1/|x|``, which
  codes alone cannot reconstruct.

Scale shape: training shuffles are bounded by ksub×dim keys per
round (never corpus-sized); encoding is ZERO-shuffle (the m codebooks
ride along as one broadcast array row and each vector argmins every
subspace inside a single projection); search scans only the probed
cells, joins against the ≤ num_queries broadcast LUT relation, and
scores each candidate with m integer array lookups instead of a
dim-length dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import (
    _centroid_array_from,
    _dot,
    _sq_dist,
    ivf_assignments,
    kmeans_centroids,
    probe_cells,
    scaled_vectors,
)


def _vec_dim(emb: DataFrame, vec_col: str) -> int:
    """Static vector width from a one-row probe (embedding columns are
    fixed-width by contract; the schema alone cannot carry it)."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("cannot infer vector width from an empty corpus")
    return row["d"]


def _grouped_argmin(q_col):
    """array_max over (neg_dist, neg_id) structs against an attached
    per-group ``cents`` array = the argmin with ties to the lower id —
    the grouped form of ``similarity._kmeans_assign``'s scorer."""
    scored = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            (-_sq_dist(q_col, s["cq"])).alias("neg_d"),
            (-s["centroid_id"]).alias("neg_cid"),
        ),
    )
    return F.array_max(scored)


def _grouped_kmeans_iterate(
    sub: DataFrame, ksub: int, iters: int, id_col: str
) -> DataFrame:
    """All m subspace Lloyd iterations fused into ONE job sequence:
    ``sub`` is (subspace, id, q); every round is one broadcast-join
    argmin assignment over all subspaces at once plus one
    (subspace, cell, pos)-keyed update shuffle (≤ m×ksub×(dim/m) =
    ksub×dim keys — the same bound as m separate trainings). Math is
    identical to running ``similarity._kmeans_iterate`` per subspace
    (groups are independent; same md5-ordered seeds, tie-breaks,
    floor division), so the unrolled per-subspace oracle CTEs are unchanged
    — this is purely a job-count optimization (m× fewer Spark actions
    per round; the sequential per-subspace loop paid m× the fixed
    job-scheduling cost).
    """
    # content-spread deterministic seeds: the ksub ids with the
    # smallest md5(id||'|seed') — same key as similarity._seed_key,
    # so every subspace seeds from the SAME vectors (slices of one
    # id set), mirrorable per-subspace in the oracle. TakeOrdered
    # top-k over the distinct ids, then one filtered collect of the
    # m×ksub seed slices.
    #
    # Per-round shape (r13, same rewrite as similarity._kmeans_iterate):
    # the update's (subspace, cell, pos) partial sums — bounded by
    # ksub×dim keys, metadata-scale by construction — are COLLECTED
    # and folded driver-side (Python // ≡ the engines' pmod-identity
    # floor division on exact int64 sums; empty cells keep their
    # previous codeword), replacing the per-round collect_list
    # re-aggregation + left-join + localCheckpoint chain. The final
    # codebook relation is a driver-local m×ksub-row DataFrame with
    # no lineage for encode/LUT consumers to re-execute. Bit-identical
    # by the same argument.
    from .similarity import _seed_key

    spark = sub.sparkSession
    seed_ids = [
        r[id_col]
        for r in (
            sub.select(F.col(id_col)).distinct()
            .orderBy(_seed_key(id_col), F.col(id_col).asc())
            .limit(ksub)
            .collect()
        )
    ]
    seed_rows = (
        sub.filter(F.col(id_col).isin(seed_ids))
        .select(
            "subspace",
            F.col(id_col).alias("centroid_id"),
            F.col("q").alias("cq"),
        )
        .collect()
    )
    # driver-local state: {(subspace, centroid_id): codeword}
    cents_local: dict[tuple[int, int], list[int]] = {
        (int(r["subspace"]), int(r["centroid_id"])): list(r["cq"])
        for r in seed_rows
    }
    # Same bounded-collect invariant as similarity._kmeans_iterate:
    # the per-round fold is m×ksub×subdim cells — metadata-scale by
    # construction for every declared consumer; fail loudly if an
    # oversized configuration would turn the collect data-scale.
    from .similarity import KMEANS_MAX_FOLD_CELLS

    if cents_local:
        subdim = len(next(iter(cents_local.values())))
        n_cells = len(cents_local) * subdim
        if n_cells > KMEANS_MAX_FOLD_CELLS:
            raise ValueError(
                "PQ codebook driver-side fold bound exceeded: "
                f"m×ksub×subdim = {n_cells} > {KMEANS_MAX_FOLD_CELLS}"
                " — shrink ksub/m or raise KMEANS_MAX_FOLD_CELLS "
                "deliberately"
            )

    def cents_df() -> DataFrame:
        return spark.createDataFrame(
            [
                (s, c, [int(x) for x in cq])
                for (s, c), cq in sorted(cents_local.items())
            ],
            schema="subspace int, centroid_id long, cq array<bigint>",
        )

    for _ in range(iters):
        carr = F.broadcast(
            cents_df().groupBy("subspace").agg(
                F.array_sort(
                    F.collect_list(F.struct("centroid_id", "cq"))
                ).alias("cents")
            )
        )
        best = _grouped_argmin(F.col("q"))
        assigned = sub.join(carr, "subspace").select(
            "subspace", "q", (-best["neg_cid"]).alias("cell")
        )
        sums = (
            assigned.select(
                "subspace", "cell", F.posexplode("q").alias("pos", "val")
            )
            .groupBy("subspace", "cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        per_cell: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in sums:
            per_cell.setdefault(
                (int(r["subspace"]), int(r["cell"])), {}
            )[int(r["pos"])] = (int(r["s"]), int(r["n"]))
        for key, by_pos in per_cell.items():
            cents_local[key] = [
                s // n for _, (s, n) in sorted(by_pos.items())
            ]
    return cents_df()


def _dense_codes(cents: DataFrame) -> DataFrame:
    """Relabel trained centroid ids to DENSE per-subspace codes
    0..ksub-1 (rank by centroid_id): md5-seeded training leaves
    centroid ids as arbitrary seed vec_ids, but PQ codes must be
    dense — element_at(books[j], code + 1) is the O(1) ADC lookup and
    a code must fit a byte at ksub=256. Rank is monotone in
    centroid_id, so every argmin tie-break is preserved under the
    relabel; the oracle applies the same row_number remap. The window
    is (m × ksub)-row metadata, never corpus-scale."""
    wdw = Window.partitionBy("subspace").orderBy("centroid_id")
    return cents.select(
        "subspace",
        (F.row_number().over(wdw) - 1).cast("int").alias("code"),
        "cq",
    )


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train the m per-subspace codebooks: slice every quantized
    vector into m contiguous subvectors and run the integer-exact
    Lloyd iteration on each slice, seeded deterministically from the
    ksub smallest md5(id||'|seed') ids. All m trainings are FUSED into one
    grouped job sequence (``_grouped_kmeans_iterate``) — numerically
    identical to m independent ``similarity._kmeans_iterate`` runs
    (asserted by test), m× fewer Spark actions.

    Returns (subspace int, code int, cq array<long>) — m×ksub rows.
    ksub=16 keeps the pinned demo oracle-checkable in seconds;
    production uses ksub=256 (byte codes) on a training SAMPLE, same
    plan.
    """
    dim = _vec_dim(emb, vec_col)
    if dim % m != 0:
        raise ValueError(
            f"m ({m}) must divide the vector width ({dim}): PQ slices "
            "the vector into m equal contiguous subvectors"
        )
    w = dim // m
    v = scaled_vectors(emb, vec_col, id_col).select(id_col, "q")
    sub = v.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("subspace"),
                        F.slice("q", j * w + 1, w).alias("q"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, F.col("s.subspace").alias("subspace"), F.col("s.q").alias("q"))
    cents = _grouped_kmeans_iterate(sub, ksub, iters, id_col)
    return _dense_codes(cents)


def _validated_subwidth(
    df: DataFrame, q_col: str, books: DataFrame, m: int
) -> int:
    """The subvector width ``dim // m`` — validated, not inferred by
    silent truncation. ``pq_codebooks`` checks divisibility at train
    time, but ``pq_encode``/``query_luts`` are also called directly
    with a caller-supplied ``m`` (e.g. the streaming index builders):
    a mismatched ``m`` would otherwise mis-slice the vectors against
    codewords of a different length and produce wrong codes/scores
    with no error. Two metadata-scale probes (one row of the corpus,
    one codebook entry) make it a ValueError instead."""
    brow = books.select(F.size(F.col("cq")).alias("bw")).first()
    if brow is None:
        raise ValueError("codebooks are empty")
    row = df.select(F.size(F.col(q_col)).alias("d")).first()
    if row is None:
        # empty input (e.g. an empty streaming micro-batch): zero rows
        # encode to zero rows under any width — the trained codebook
        # is the authority
        return brow["bw"]
    dim = row["d"]
    if m <= 0 or dim % m != 0:
        raise ValueError(
            f"m ({m}) must divide the vector width ({dim}): PQ slices "
            "the vector into m equal contiguous subvectors"
        )
    w = dim // m
    if brow["bw"] != w:
        raise ValueError(
            f"codebook subvector width ({brow['bw']}) != dim/m "
            f"({w}): the codebooks were trained with a different m "
            "or vector width"
        )
    return w


def _books_row(books: DataFrame):
    """The m codebooks folded into ONE broadcastable row:
    ``books[j]`` = the subspace-j codebook as an array of (code, cq)
    structs sorted by code — so ``element_at(books[j], code + 1)`` is
    the codeword. Same attach pattern as the coarse centroid array."""
    per_sub = books.groupBy("subspace").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("code"), F.col("cq")))
        ).alias("entries")
    )
    return F.broadcast(
        per_sub.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "entries"))
                ),
                lambda s: s["entries"],
            ).alias("books")
        )
    )


def pq_encode(
    emb: DataFrame,
    books: DataFrame,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    subwidth: int | None = None,
) -> DataFrame:
    """Encode every vector as m codes + its stored norm:
    (id, codes array<int>, norm_sq long).

    ZERO-shuffle: the codebooks ride along as one broadcast array row;
    each vector slices itself m ways and argmins each slice against
    its codebook inside a single projection (``array_max`` over
    (neg_dist, neg_code) structs = min distance, ties to the lower
    code — identical to the trainer's assignment tie-break)."""
    v = scaled_vectors(emb, vec_col, id_col)
    w = F.lit(subwidth if subwidth is not None
              else _validated_subwidth(v, "q", books, m))

    def best_code(book, j):
        sub = F.slice(F.col("q"), j * w + 1, w)
        scored = F.transform(
            book,
            lambda e: F.struct(
                (-_sq_dist(sub, e["cq"])).alias("neg_d"),
                (-e["code"]).alias("neg_code"),
            ),
        )
        return (-F.array_max(scored)["neg_code"]).cast("int")

    return v.crossJoin(_books_row(books)).select(
        id_col,
        F.transform("books", best_code).alias("codes"),
        "norm_sq",
    )


def _coarse_best_with_cq(q_col, norm_col):
    """The coarse argmax of ``similarity._centroid_scores`` (cosine,
    ties to the lower centroid id) with the WINNING centroid's
    codeword carried in the struct: (ccos, neg_cid, ccq). Appending
    ccq can never change the winner — neg_cid is unique per element,
    so the lexicographic struct comparison is always decided before
    the third field. Lets a fused projection derive both the cell and
    the residual (q - ccq) without re-joining on cell."""

    def score(c):
        ccos = _dot(q_col, c["cq"]) / (
            F.sqrt(norm_col.cast("double"))
            * F.sqrt(c["cn"].cast("double"))
        )
        return F.struct(
            ccos.alias("ccos"),
            (-c["centroid_id"]).alias("neg_cid"),
            c["cq"].alias("ccq"),
        )

    return F.array_max(F.transform(F.col("cents"), score))


def _ivfpq_index(
    emb: DataFrame,
    cents: DataFrame,
    books: DataFrame,
    m: int,
    vec_col: str,
    id_col: str,
    residual: bool,
    subwidth: int | None = None,
) -> DataFrame:
    """The served IVF-PQ index relation (id, cell, codes, norm_sq)
    built in ONE corpus scan: the coarse cosine argmax and the m
    per-subspace encode argmins run inside a single zero-shuffle
    projection with the centroid array and the codebooks attached as
    broadcast one-row relations.

    This replaces the previous two-scan shape (``ivf_assignments`` +
    ``pq_encode``/``pq_encode_residual`` joined on id): the id-keyed
    equi-join shuffled the full index relation just to glue two
    columns computed from the same row — at 100 TB that is a
    corpus-sized exchange for zero information. Values are identical:
    the coarse scorer is ``_centroid_scores``'s expression verbatim
    (residual mode carries the winner's codeword in the argmax struct
    — see ``_coarse_best_with_cq``), and the encode argmin is
    ``pq_encode``'s. The expensive argmax lands in a NAMED column
    consumed by a separate projection, which CollapseProject keeps
    un-inlined (non-cheap, referenced twice), so it evaluates once
    per row."""
    v = scaled_vectors(emb, vec_col, id_col)
    w = F.lit(
        subwidth
        if subwidth is not None
        else _validated_subwidth(v, "q", books, m)
    )
    carr = (
        _centroid_array_from(cents)
        if cents is not None
        else None
    )
    if residual:
        best = _coarse_best_with_cq(F.col("q"), F.col("norm_sq"))
        assigned = (
            v.crossJoin(carr)
            .select(id_col, "q", "norm_sq", best.alias("_best"))
            .select(
                id_col,
                "norm_sq",
                (-F.col("_best")["neg_cid"]).alias("cell"),
                F.zip_with(
                    "q", F.col("_best")["ccq"], lambda a, b: a - b
                ).alias("_t"),
            )
        )
    else:
        from .similarity import _centroid_scores

        best = F.array_max(
            _centroid_scores(F.col("q"), F.col("norm_sq"))
        )
        assigned = v.crossJoin(carr).select(
            id_col,
            "norm_sq",
            (-best["neg_cid"]).alias("cell"),
            F.col("q").alias("_t"),
        )

    def best_code(book, j):
        sub = F.slice(F.col("_t"), j * w + 1, w)
        scored = F.transform(
            book,
            lambda e: F.struct(
                (-_sq_dist(sub, e["cq"])).alias("neg_d"),
                (-e["code"]).alias("neg_code"),
            ),
        )
        return (-F.array_max(scored)["neg_code"]).cast("int")

    return assigned.crossJoin(_books_row(books)).select(
        id_col,
        "cell",
        F.transform("books", best_code).alias("codes"),
        "norm_sq",
    )


def query_luts(
    qv: DataFrame, books: DataFrame, m: int, subwidth: int | None = None
) -> DataFrame:
    """The per-query ADC lookup tables: (query_id, qn,
    lut array<array<long>>) where ``lut[j][c+1]`` = <q_slice_j,
    codebook_j[c]> — exact integer dots, built once per query
    (num_queries × m × ksub longs, broadcastable). Shared by the
    in-flight ``ann_ivfpq_topk`` and the persisted-index serve path
    (``streaming.ann_index.ivfpq_index_topk``) so their scoring
    cannot drift. ``qv`` is (query_id, qq, qn)."""
    w = F.lit(
        subwidth
        if subwidth is not None
        else _validated_subwidth(qv, "qq", books, m)
    )
    return qv.crossJoin(_books_row(books)).select(
        "query_id",
        "qn",
        F.transform(
            "books",
            lambda book, j: F.transform(
                book,
                lambda e: _dot(F.slice(F.col("qq"), j * w + 1, w), e["cq"]),
            ),
        ).alias("lut"),
    )


def adc_dot():
    """The ADC sum as a column expression over (codes, lut):
    Σⱼ lut[j][codes[j]+1] — m integer lookups per candidate."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_ivfpq_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k: trained coarse cells bound the scan (same probe
    logic as ``ann_ivf_topk``), PQ codes + the per-query ADC lookup
    table score the candidates.

    ADC: for query q and candidate codes (c₁..cₘ),
    ``dot̂(q, x) = Σⱼ LUT[j][cⱼ]`` where ``LUT[j][c] = <q_slice_j,
    codebook_j[c]>`` — m integer lookups per candidate instead of a
    dim-length dot product, with the LUT built ONCE per query
    (num_queries × m × ksub longs, broadcast). Approximate cosine
    divides by the exact stored norms, so scores are deterministic
    doubles from exact integers on both engines.

    Returns (query_id, neighbor_id, adc_cosine, rank) — the
    approximation is in the VALUES (quantized dot), which is why the
    score column is named ``adc_cosine``, not ``cosine``.
    """
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(emb, k=n_centroids, iters=iters,
                              vec_col=vec_col, id_col=id_col)
    ).localCheckpoint(eager=False)
    if books is None:
        books = pq_codebooks(emb, m, ksub, iters, vec_col, id_col)
    books = books.localCheckpoint(eager=False)
    v = scaled_vectors(emb, vec_col, id_col)
    w = _validated_subwidth(v, "q", books, m)
    index = _ivfpq_index(
        emb, cents, books, m, vec_col, id_col, residual=False, subwidth=w
    )
    qv = (
        v.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("qn"),
        )
        .localCheckpoint(eager=False)
    )
    probes = probe_cells(qv, _centroid_array_from(cents), n_probe)
    luts = query_luts(qv, books, m, subwidth=w)
    cand = index.join(
        F.broadcast(probes.select("query_id", "cell")), "cell"
    ).filter(F.col("query_id") != F.col(id_col))
    scored = cand.join(F.broadcast(luts), "query_id")
    adc_cos = adc_dot() / (
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("norm_sq").cast("double"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            adc_cos.alias("adc_cosine"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )


def ann_ivfpq_rerank_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    shortlist: int | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """Two-stage IVF-PQ search with EXACT re-rank — the standard
    recall repair at compressed-index scale (Jégou et al.'s ADC +
    re-ranking): stage 1 is ``ann_ivfpq_topk`` widened to a
    ``shortlist`` of candidates per query (default 4·k), stage 2
    re-scores ONLY those candidates by the exact integer cosine over
    the raw quantized vectors and keeps the true top-k.

    Why it scales: the index still serves O(m)-byte codes (the scan
    never touches a raw vector), and the exact stage reads
    queries × shortlist raw vectors through a KEYED join — bounded by
    the shortlist, independent of corpus size. Recall is ≥ raw
    IVF-PQ's at equal probe settings by construction: the ADC top-k
    is a subset of the ADC top-shortlist, and exact scoring can only
    re-order candidates toward the true ranking (pinned as the 7th
    ``ann_recall_report`` column).

    Returns (query_id, neighbor_id, cosine, rank) — ``cosine`` (not
    ``adc_cosine``): the served score is exact.
    """
    if shortlist is None:
        shortlist = 4 * k
    if shortlist < k:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= k ({k})"
        )
    sl = ann_ivfpq_topk(
        emb, num_queries, shortlist, n_centroids, n_probe, m, ksub,
        iters, vec_col, id_col, centroids, books,
    )
    v = scaled_vectors(emb, vec_col, id_col)
    qv = v.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm_sq").alias("qn"),
    )
    nb = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("nq"),
        F.col("norm_sq").alias("nn"),
    )
    exact = (
        sl.select("query_id", "neighbor_id")
        .join(nb, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
    )
    cos = _dot(F.col("qq"), F.col("nq")) / (
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("nn").cast("double"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        exact.select(
            "query_id",
            "neighbor_id",
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )


def _residual_vectors(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, r array<long>, norm_sq): each quantized vector's
    residual against its assigned coarse centroid (r = q - c_cell,
    exact int64 micro-units), plus the RAW vector's stored norm —
    codes cannot reconstruct |x|, so serving keeps the true norm
    regardless of what the codebooks encode."""
    v = scaled_vectors(emb, vec_col, id_col)
    assigned = ivf_assignments(
        emb, vec_col=vec_col, id_col=id_col, centroids=centroids
    ).select(id_col, "cell")
    cc = F.broadcast(
        centroids.select(
            F.col("centroid_id").alias("cell"), F.col("cq").alias("_ccq")
        )
    )
    return (
        v.join(assigned, id_col)
        .join(cc, "cell")
        .select(
            id_col,
            "cell",
            F.zip_with("q", "_ccq", lambda a, b: a - b).alias("r"),
            "norm_sq",
        )
    )


def pq_codebooks_residual(
    emb: DataFrame,
    centroids: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Codebooks over RESIDUALS against the coarse centroids — FAISS's
    default ``by_residual=true`` (Jégou et al. 2011 §IV): residuals
    concentrate near zero, so the same ksub codewords spend their
    precision on a tighter distribution and recall at equal bytes
    improves. The cost is coupling: these codebooks are only valid
    with the coarse quantizer they were trained against (the
    independence trade-off pq_codebooks documents). Training is the
    identical fused grouped-Lloyd job over sliced residual vectors —
    integer-exact, same seeds/tie-breaks, so the unrolled oracle CTEs
    mirror it term for term."""
    dim = _vec_dim(emb, vec_col)
    if dim % m != 0:
        raise ValueError(
            f"m ({m}) must divide the vector width ({dim}): PQ slices "
            "the vector into m equal contiguous subvectors"
        )
    w = dim // m
    res = _residual_vectors(emb, centroids, vec_col, id_col)
    sub = res.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("subspace"),
                        F.slice("r", j * w + 1, w).alias("q"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(
        id_col, F.col("s.subspace").alias("subspace"), F.col("s.q").alias("q")
    )
    cents = _grouped_kmeans_iterate(sub, ksub, iters, id_col)
    return _dense_codes(cents)


def pq_encode_residual(
    emb: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    subwidth: int | None = None,
) -> DataFrame:
    """Encode every vector's residual as m codes:
    (id, cell, codes array<int>, norm_sq long). Same ZERO-shuffle
    broadcast-codebook argmin as ``pq_encode``, over the residual
    slices; the cell rides along so serving needs no second coarse
    assignment."""
    res = _residual_vectors(emb, centroids, vec_col, id_col)
    # probe the RAW vector for the width (same dim as the residual)
    # — probing `res` would execute the full coarse-assignment
    # lineage just to read one row
    w = F.lit(subwidth if subwidth is not None
              else _validated_subwidth(emb, vec_col, books, m))

    def best_code(book, j):
        sub = F.slice(F.col("r"), j * w + 1, w)
        scored = F.transform(
            book,
            lambda e: F.struct(
                (-_sq_dist(sub, e["cq"])).alias("neg_d"),
                (-e["code"]).alias("neg_code"),
            ),
        )
        return (-F.array_max(scored)["neg_code"]).cast("int")

    return res.crossJoin(_books_row(books)).select(
        id_col,
        "cell",
        F.transform("books", best_code).alias("codes"),
        "norm_sq",
    )


def ann_ivfpq_res_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k with residual encoding (``by_residual=true``).

    ADC decomposes exactly: x̂ = c_cell + decode(codes), so
    ``<q, x̂> = <q, c_cell> + Σⱼ LUT[j][cⱼ]`` — the lookup table stays
    CELL-INDEPENDENT (raw query slices against residual codewords,
    built once per query like the raw variant) and the coarse term is
    one integer dot per (query, probed cell): ≤ num_queries × n_probe
    extra rows, broadcast. Serving cost is therefore identical to
    ``ann_ivfpq_topk`` plus a metadata-scale addend.

    Returns (query_id, neighbor_id, adc_cosine, rank)."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(emb, k=n_centroids, iters=iters,
                              vec_col=vec_col, id_col=id_col)
    ).localCheckpoint(eager=False)
    if books is None:
        books = pq_codebooks_residual(
            emb, cents, m, ksub, iters, vec_col, id_col
        )
    books = books.localCheckpoint(eager=False)
    v = scaled_vectors(emb, vec_col, id_col)
    w = _validated_subwidth(v, "q", books, m)
    index = _ivfpq_index(
        emb, cents, books, m, vec_col, id_col, residual=True, subwidth=w
    )
    qv = (
        v.filter(F.col(id_col) < num_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm_sq").alias("qn"),
        )
        .localCheckpoint(eager=False)
    )
    probes = probe_cells(qv, _centroid_array_from(cents), n_probe)
    luts = query_luts(qv, books, m, subwidth=w)
    qc = (
        probes.join(
            F.broadcast(
                cents.select(
                    F.col("centroid_id").alias("cell"),
                    F.col("cq").alias("_ccq"),
                )
            ),
            "cell",
        )
        .select(
            "query_id", "cell", _dot(F.col("qq"), F.col("_ccq")).alias("_qc")
        )
    )
    cand = index.join(
        F.broadcast(probes.select("query_id", "cell")), "cell"
    ).filter(F.col("query_id") != F.col(id_col))
    scored = cand.join(F.broadcast(qc), ["query_id", "cell"]).join(
        F.broadcast(luts), "query_id"
    )
    adc_cos = (F.col("_qc") + adc_dot()) / (
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("norm_sq").cast("double"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            adc_cos.alias("adc_cosine"),
        )
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )
