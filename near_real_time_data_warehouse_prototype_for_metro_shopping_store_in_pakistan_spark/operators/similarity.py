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
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = SCALE,
) -> DataFrame:
    """(id, q: array<bigint>, norm_sq: bigint) with integer micro-unit
    components.  ``scale=1`` is the identity rescale for vectors whose
    components are ALREADY integer-valued (e.g. the feature-hashed
    signed counts of ``text_profile.hashed_embedding_vectors``) —
    cosine is scale-invariant, so every downstream formula is
    unchanged while the int64 overflow headroom widens from micro-unit
    squares to raw-count squares."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale, 0).cast("long"),
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


def _sign_matrix(total: int, dim: int):
    """Deterministic ±1 hyperplane components: r[g][i] = +1 iff
    md5_long(f"{g}|{i}") is odd — the same pseudo-random direction the
    DuckDB oracle derives SQL-side. Tiny (total×dim), built driver- or
    worker-side from nothing but the two indices."""
    import hashlib

    import numpy as np

    R = np.empty((total, dim), dtype=np.int64)
    for g in range(total):
        for i in range(dim):
            h = int(hashlib.md5(f"{g}|{i}".encode()).hexdigest()[:15], 16)
            R[g, i] = 1 if h % 2 == 1 else -1
    return R


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
    1-(1-p^P)^L.

    Scale shape: ZERO shuffles and L rows out per vector (this
    replaces a posexplode×sequence formulation whose dim×L·P (≈1,536×)
    row inflation plus a shuffle on (id, g) made the ANN path slower
    than the exact scan). Each Arrow worker rebuilds the tiny ±1
    matrix once (memoized per dim) and applies it as a single exact
    int64 GEMM ``Q @ R.T`` per batch; one Arrow row out per vector —
    the per-table fan-out happens JVM-side via posexplode, so the
    array column q crosses the Python boundary once, not L times. An
    unrolled JVM-expression variant was measured 6× SLOWER (the
    L·P×dim flat expression tree defeats whole-stage codegen), so the
    GEMM is the only strategy. Projections are integer sums either
    way, so buckets — and the DuckDB oracle — are bit-identical.
    """
    import numpy as np
    import pandas as pd

    v = scaled_vectors(emb, vec_col, id_col)
    total = num_planes * num_tables
    out_schema = (
        f"{id_col} long, buckets array<bigint>, q array<bigint>, norm_sq long"
    )

    def project(batches):
        cache: dict[int, np.ndarray] = {}

        def signs(d: int) -> np.ndarray:
            if d not in cache:
                cache[d] = _sign_matrix(total, d)
            return cache[d]

        weights = 1 << np.arange(num_planes, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.array([np.asarray(x, dtype=np.int64) for x in pdf["q"]])
            proj = Q @ signs(Q.shape[1]).T  # (n, total), exact int64
            pos = (proj > 0).astype(np.int64)
            # (n, L) bucket matrix: bit-pack each table's plane block
            buckets = np.stack(
                [
                    pos[:, t * num_planes : (t + 1) * num_planes] @ weights
                    for t in range(num_tables)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "buckets": list(buckets),
                    "q": list(pdf["q"]),
                    "norm_sq": pdf["norm_sq"].to_numpy(),
                }
            )

    return v.mapInPandas(project, out_schema).select(
        id_col,
        F.posexplode("buckets").alias("table_id", "bucket"),
        "q",
        "norm_sq",
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
    hyperplane-LSH — the bucket-bounded scale path next to the exact
    ``cosine_topk`` baseline.

    Candidates are vectors sharing a query's bucket in ANY of the
    ``num_tables`` hash tables (band-OR). The whole search is ONE
    fused Arrow pass over the corpus plus a k·|Q|-row merge:

    - Query buckets/vectors are computed DRIVER-side — the query set
      is bounded by ``num_queries`` (the caller's knob, like a
      broadcast threshold), so collecting it is metadata-scale — and
      ship to workers in the task closure.
    - Each Arrow batch computes its vectors' buckets (one int64 GEMM
      against the deterministic ±1 matrix), band-OR matches them
      against the query buckets, evaluates exact cosine ONLY for the
      matched pairs (per-query gathered GEMVs — work ∝ candidates,
      not corpus×|Q|), and emits its local top-k per query.
    - A final window merges the per-batch top-ks globally: the only
      shuffle moves ≤ batches·|Q|·k rows.

    Scaling uses sign·floor(|x·1e6|+0.5) — the exact HALF_UP twin of
    ``scaled_vectors``' F.round on the same float64 products — and the
    cosine evaluates in the identical IEEE order as the column
    formula, so results match the unfused bucket-join form and the
    DuckDB oracle bit-for-bit. Recall tunes with (num_planes ↓,
    num_tables ↑); cost with the opposite.
    """
    import numpy as np
    import pandas as pd

    total = num_planes * num_tables
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    def scale_ints(x: "np.ndarray") -> "np.ndarray":
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    qrows = emb.filter(F.col(id_col) < num_queries).select(id_col, vec_col).collect()
    nq = len(qrows)
    if nq:
        dim = len(qrows[0][vec_col])
        R = _sign_matrix(total, dim)
        qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
        Qm = np.array(
            [
                scale_ints(np.asarray(r[vec_col], dtype=np.float64) * SCALE)
                for r in qrows
            ]
        )
        qproj = Qm @ R.T  # (nq, total)
        qpos = (qproj > 0).astype(np.int64)
        # (num_tables, nq) query bucket matrix
        qbuckets = np.stack(
            [
                qpos[:, t * num_planes : (t + 1) * num_planes] @ weights
                for t in range(num_tables)
            ]
        )
        qn_sqrt = np.sqrt((Qm * Qm).sum(axis=1).astype(np.float64))
    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        for pdf in batches:
            if pdf.empty or not nq:
                continue
            ids = pdf[id_col].to_numpy()
            X = (
                np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
                * SCALE
            )
            V = scale_ints(X)
            proj = V @ R.T
            pos = (proj > 0).astype(np.int64)
            mask = np.zeros((len(ids), nq), dtype=bool)
            for t in range(num_tables):
                bucket = pos[:, t * num_planes : (t + 1) * num_planes] @ weights
                mask |= bucket[:, None] == qbuckets[t][None, :]
            mask &= ids[:, None] != qids[None, :]
            nb = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            out_q: list = []
            out_n: list = []
            out_c: list = []
            for j in range(nq):
                idx = np.nonzero(mask[:, j])[0]
                if idx.size == 0:
                    continue
                dots = V[idx] @ Qm[j]  # exact int64, candidates only
                # same association order as the column formula:
                # dot / (√qn · √norm)
                cosines = dots / (qn_sqrt[j] * nb[idx])
                order = np.lexsort((ids[idx], -cosines))[:k]
                out_q.extend([int(qids[j])] * len(order))
                out_n.extend(ids[idx][order])
                out_c.extend(cosines[order])
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
                )

    scored = emb.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _centroid_array(v: DataFrame, n_centroids: int, id_col: str) -> DataFrame:
    """The centroid set folded into ONE broadcastable row: an array of
    (centroid_id, cq, cn) structs, sorted by centroid id. Attaching
    this single row to the corpus scan lets every row score ALL
    centroids in one projection — no row inflation, no shuffle."""
    return F.broadcast(
        v.filter(F.col(id_col) < n_centroids)
        .select(
            F.struct(
                F.col(id_col).alias("centroid_id"),
                F.col("q").alias("cq"),
                F.col("norm_sq").alias("cn"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )


def _centroid_array_from(cents: DataFrame):
    """Broadcastable one-row centroid array from an explicit trained
    centroid relation (centroid_id, cq, cn) — e.g.
    ``kmeans_centroids`` output — instead of the corpus-prefix seed."""
    return F.broadcast(
        cents.select(
            F.struct(
                F.col("centroid_id").alias("centroid_id"),
                F.col("cq").alias("cq"),
                F.col("cn").alias("cn"),
            ).alias("c")
        ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )


def _centroid_scores(q_col, norm_col):
    """Per-row array of (ccos, neg_cid) structs against the attached
    ``cents`` array — struct-comparable so array_max IS the argmax
    with the (cosine DESC, centroid_id ASC) tie-break."""
    def score(c):
        dot = F.aggregate(
            F.zip_with(q_col, c["cq"], lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        ccos = dot / (
            F.sqrt(norm_col.cast("double")) * F.sqrt(c["cn"].cast("double"))
        )
        return F.struct(ccos.alias("ccos"), (-c["centroid_id"]).alias("neg_cid"))

    return F.transform(F.col("cents"), score)


def ivf_assignments(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its best
    centroid by cosine (ties break on centroid id).

    Centroids are a deterministic subset of the corpus (the first
    ``n_centroids`` ids) — the seeding step of k-means|| without the
    iterations, which keeps the operator reproducible and
    oracle-checkable; production would plug trained centroids into the
    same plan.

    Plan shape: the centroid set rides along as one broadcast
    array-of-structs row; each corpus row scores every centroid inside
    a single projection and ``array_max`` picks the cell — ZERO
    shuffle and ZERO row inflation, vs the textbook
    crossJoin(×n_centroids) + per-id window which shuffles an
    n_centroids-times-inflated corpus just to discard all but the
    argmax."""
    v = scaled_vectors(emb, vec_col, id_col)
    carr = (
        _centroid_array_from(centroids)
        if centroids is not None
        else _centroid_array(v, n_centroids, id_col)
    )
    best = F.array_max(_centroid_scores(F.col("q"), F.col("norm_sq")))
    return (
        v.crossJoin(carr)
        .select(
            id_col,
            "q",
            "norm_sq",
            (-best["neg_cid"]).alias("cell"),
        )
    )


def probe_cells(qv: DataFrame, probe_arr: DataFrame, n_probe: int) -> DataFrame:
    """(query_id, qq, qn, cell): the top-``n_probe`` cells per query
    by cosine against the broadcast centroid array — fused
    sort/slice/explode ((cosine, -centroid) struct order = cosine
    DESC then centroid ASC), so only the few query rows ever widen.
    The SINGLE definition behind both the in-flight ``ann_ivf_topk``
    and the persisted-index serve path (``streaming.ann_index``), so
    their probe tie-breaks cannot drift."""
    return (
        qv.crossJoin(probe_arr)
        .select(
            "query_id",
            "qq",
            "qn",
            F.explode(
                F.slice(
                    F.sort_array(
                        _centroid_scores(F.col("qq"), F.col("qn")), asc=False
                    ),
                    1,
                    n_probe,
                )
            ).alias("probe"),
        )
        .select(
            "query_id", "qq", "qn", (-F.col("probe")["neg_cid"]).alias("cell")
        )
    )


def ann_ivf_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF inverted index —
    the cell-partitioned scale path beside the hyperplane-LSH one.

    Each query scans only the ``n_probe`` cells whose centroids are
    closest to it (~n_probe/n_centroids of the corpus) instead of the
    full scan of ``cosine_topk``; exact cosine is computed inside the
    probed cells. Recall/cost tunes with (n_centroids, n_probe). The
    candidate join is a key-bounded equi-join on ``cell``.

    ``centroids`` plugs a TRAINED centroid relation
    (``kmeans_centroids`` output: centroid_id, cq, cn) into the same
    plan in place of the corpus-prefix seed — assignment and probing
    both score against it by cosine.
    """
    assigned = ivf_assignments(emb, n_centroids, vec_col, id_col, centroids)
    v = scaled_vectors(emb, vec_col, id_col)
    qv = v.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm_sq").alias("qn"),
    )
    probe_arr = (
        _centroid_array_from(centroids)
        if centroids is not None
        else _centroid_array(v, n_centroids, id_col)
    )
    probes = probe_cells(qv, probe_arr, n_probe)
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
    vec_scale: int = SCALE,
    n_vectors: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection, executed as a distributed block matrix product.

    Vectors are tiled into HASH-derived blocks — nblocks =
    ceil(count/block_size), blk = xxhash64(id) % nblocks, the same
    discipline as SemDeDup's degenerate-cell guard: id-range blocks
    (floor(id/block_size)) would let a sparse id space put ~one row
    per occupied block and grow the broadcast block-pair grid
    quadratically in occupied blocks. The count is one
    metadata-cheap job that runs EAGERLY at call time (constructing
    the DataFrame scans the corpus once to size the grid) — pass
    ``n_vectors`` (an exact or conservative row count) to keep the
    call fully lazy when composing plans or invoking repeatedly.
    Each unordered block-pair (ba <= bb) becomes
    one cogrouped-``applyInPandas`` task computing the tile's dot
    products with a single int64 numpy GEMM — ~100× the per-row
    array-lambda throughput, still exact integer math (micro-unit
    components keep every dot < 2^47; see module docstring), and the
    cosine expression evaluates in the identical IEEE order as the
    column formula, so results are bit-equal to the naive join and the
    DuckDB oracle is unchanged. Blocks are not id-monotone, so
    diagonal tiles keep the strict ``a < b`` triangle while
    off-diagonal tiles keep every cross pair normalized to
    (min, max) — every unordered pair lands in exactly one tile.

    Scale shape: row inflation is O(#blocks) copies of the corpus —
    the unavoidable cost of an EXACT all-pairs op; tasks are
    independent tiles (no shuffle after the block join). At 100 TB one
    bounds candidates first with hyperplane LSH
    (``hyperplane_buckets``) and runs this GEMM per bucket.
    """
    import numpy as np
    import pandas as pd

    v = scaled_vectors(emb, vec_col, id_col, scale=vec_scale).select(
        F.col(id_col).alias("vid"), "q", "norm_sq"
    )
    n = emb.count() if n_vectors is None else n_vectors
    nblocks = max(1, -(-n // block_size))
    v = v.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(nblocks)).cast("long")
    )
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
        # hash blocks are not id-monotone (see docstring): diagonal
        # tiles keep the strict triangle; off-diagonal tiles keep
        # every cross pair (blocks disjoint -> ia != ib) normalized
        # to (min, max) — cosine is symmetric, so the value is the
        # same either orientation
        if bool(lpdf["ba"].iloc[0] == lpdf["bb"].iloc[0]):
            keep = (cos >= threshold) & (ia[:, None] < ib[None, :])
            ii, jj = np.nonzero(keep)
            return pd.DataFrame(
                {"vec_a": ia[ii], "vec_b": ib[jj], "cosine": cos[ii, jj]}
            )
        keep = cos >= threshold
        ii, jj = np.nonzero(keep)
        a, b = ia[ii], ib[jj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cosine": cos[ii, jj],
            }
        )

    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("rba", "rbb"))
        .applyInPandas(gemm, "vec_a long, vec_b long, cosine double")
    )


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 2048,
    vec_scale: int = SCALE,
    n_vectors: int | None = None,
) -> DataFrame:
    """Exact k-nearest-neighbor graph under cosine: for every vector
    its top-k neighbors (self excluded), ties broken by neighbor id —
    (vec_id, neighbor_id, rnk, cosine).

    Same distributed block-GEMM shape as ``cosine_neardup_pairs``, but
    the graph is DIRECTED (b ∈ knn(a) does not imply a ∈ knn(b)), so
    tiles cover the full block grid and each tile keeps only its local
    top-k per source row (numpy lexsort under the global total order
    (cosine desc, id asc) — top-k selection is associative under a
    total order, so merging per-tile winners is exact).  The final
    merge is a window PARTITIONED BY SOURCE VECTOR — never global —
    over ≤ k·(n/block) candidate rows per source instead of n.

    Scale shape: exact all-pairs is O((n/block)²) tiles — the honest
    cost of an exact graph; this is the baseline approximate variants
    (per-IVF-cell GEMM, the SemDeDup shape) are measured against, the
    role ``ann_recall_report`` plays for query serving.  Zero vectors
    produce NaN cosines, which numpy sorts last and the window never
    ranks into the top k (both engines agree).
    """
    v = scaled_vectors(emb, vec_col, id_col, scale=vec_scale).select(
        F.col(id_col).alias("vid"), "q", "norm_sq"
    )
    # hash-derived blocks sized from one metadata-cheap count — never
    # floor(id/block): a sparse id space would otherwise occupy ~one
    # row per block and square the broadcast tile grid (the SemDeDup
    # degenerate-cell discipline). The graph is directed and the grid
    # is full, so no tile-side ordering care is needed. The count
    # runs EAGERLY at call time unless ``n_vectors`` supplies it —
    # pass a (conservative) row count to keep composition lazy.
    n = emb.count() if n_vectors is None else n_vectors
    nblocks = max(1, -(-n // block_size))
    v = v.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(nblocks)).cast("long")
    )
    blks = v.select("blk").distinct()
    pairs = (
        blks.alias("x")
        .join(blks.alias("y"), F.lit(True))
        .select(F.col("x.blk").alias("ba"), F.col("y.blk").alias("bb"))
    )
    left = (
        v.alias("l")
        .join(F.broadcast(pairs.alias("pl")), F.col("l.blk") == F.col("pl.ba"))
        .select("pl.ba", "pl.bb", "l.vid", "l.q", "l.norm_sq")
    )
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

    tile = _tile_topk_fn(k)
    cands = (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("rba", "rbb"))
        .applyInPandas(tile, "vec_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "rnk", "cosine")
    )


def _tile_topk_fn(k: int):
    """Per-tile directed top-k for the kNN graph builders: exact int64
    GEMM over one (left-block × right-block) tile, then each source
    row keeps its local top-k under the global total order
    (cosine desc, id asc) — top-k selection is associative under a
    total order, so the per-source merge window over per-tile winners
    is exact. Self-pairs excluded; NaN cosines (zero vectors) sort
    last and are dropped."""
    import numpy as np
    import pandas as pd

    def tile_topk(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "cosine": []}
        )
        if lpdf.empty or rpdf.empty:
            return empty
        A = np.array([np.asarray(x, dtype=np.int64) for x in lpdf["q"]])
        B = np.array([np.asarray(x, dtype=np.int64) for x in rpdf["rq"]])
        dots = A @ B.T  # exact int64
        na = np.sqrt(lpdf["norm_sq"].to_numpy(dtype=np.float64))
        nb = np.sqrt(rpdf["rnorm_sq"].to_numpy(dtype=np.float64))
        # same association order as the column formula and the oracle
        cos = dots / (na[:, None] * nb[None, :])
        ia = lpdf["vid"].to_numpy()
        ib = rpdf["rvid"].to_numpy()
        out_src, out_dst, out_cos = [], [], []
        for i in range(cos.shape[0]):
            row = cos[i]
            mask = ib != ia[i]  # self excluded; NaN sorts last anyway
            cand_ids = ib[mask]
            cand_cos = row[mask]
            # stable sort by id asc, then by -cosine: yields the global
            # total order (cosine desc, id asc); NaN keys sort last
            order = np.lexsort((cand_ids, -cand_cos))[:k]
            keep = ~np.isnan(cand_cos[order])
            order = order[keep]
            out_src.extend([ia[i]] * len(order))
            out_dst.extend(cand_ids[order])
            out_cos.extend(cand_cos[order])
        return pd.DataFrame(
            {"vec_id": out_src, "neighbor_id": out_dst, "cosine": out_cos}
        )

    return tile_topk


def knn_graph_ivf(
    emb: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 2048,
    vec_scale: int = SCALE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate k-NN graph, cell-bounded: k-means partitions the
    space (the ``kmeans_cells`` trained centroids), every vector is a
    MEMBER of exactly its argmin cell, and as a SOURCE it ranks the
    members of its ``n_probe`` nearest cells — the IVF probe
    discipline applied to graph building, the scale path beside the
    exact ``knn_graph`` whose tile grid inflates the corpus
    O(n/block) times. Recall is bounded by the probing exactly as
    IVF serving's is: a true neighbor whose home cell is outside the
    source's probe list is not examined (``knn_recall_report`` pins
    the measured cost; raising ``n_probe`` buys recall for a linear
    cost factor). Same output shape and total order as ``knn_graph``;
    rnk is dense per source over the probed candidates (< k rows when
    the probed cells are small).

    Plan shape: the probe assignment is the same zero-shuffle
    broadcast-centroid attach as ``_kmeans_assign`` (top-p slice
    instead of argmin), then per-cell hash-derived blocks — sized
    from the ≤ 2·n_centroids-row cell-count metadata, the SemDeDup
    degenerate-cell guard — tile the (cell, source-block,
    member-block) grid so no Arrow task ever owns an unbounded
    |cell|² GEMM; the final merge window is per source vector over
    ≤ k·(probed blocks) candidates, never n. Cost
    n_probe · Σ|cell| · |cell|/block tiles, controlled by
    ``n_centroids`` — set ≈ n/target_cell_size at scale (the
    50k-cells-over-5B-embeddings regime of the SemDeDup paper).
    Candidate edges are distinct by construction (members have one
    home cell; a source probes p DISTINCT cells), so the merge window
    needs no dedup.

    ``centroids`` plugs a pre-TRAINED (centroid_id, cq) relation into
    the same plan in place of the in-call Lloyd training (ignore
    ``n_centroids``/``iters`` then) — the production shape (train
    once, build/serve many), and what lets ``knn_recall_report``
    sweep probe levels without retraining per level.
    """
    v = scaled_vectors(emb, vec_col, id_col, scale=vec_scale).select(
        F.col(id_col).alias("vid"), "q", "norm_sq"
    )
    cents = (
        centroids.select("centroid_id", "cq")
        if centroids is not None
        else _kmeans_iterate(v.select("vid", "q"), n_centroids, iters, "vid")
    )
    members = (
        v.join(
            _kmeans_assign(v.select("vid", "q"), cents, "vid").select(
                "vid", "cell"
            ),
            "vid",
        ).localCheckpoint(eager=False)
    )
    sources = (
        v.join(
            _kmeans_probe(v.select("vid", "q"), cents, "vid", n_probe).select(
                "vid", "cell"
            ),
            "vid",
        ).localCheckpoint(eager=False)
    )

    # per-cell block counts as a BROADCAST-joined ≤ n_centroids-row
    # relation, not an expression literal: a create_map literal
    # carries 2·n_centroids lit nodes into every plan that embeds it
    # — ~100k literals at the docstring's 50k-cell regime, all
    # analyzer cost. Also keeps the builder fully lazy (no count
    # collect at call time).
    def with_blk(df):
        nblk = df.groupBy("cell").agg(
            F.expr(f"(count(*) + {block_size} - 1) div {block_size}")
            .alias("_nblk")
        )
        return (
            df.join(F.broadcast(nblk), "cell")
            .withColumn(
                "blk",
                F.pmod(F.xxhash64(F.col("vid")), F.col("_nblk")).cast("long"),
            )
            .drop("_nblk")
        )

    sb = with_blk(sources)
    mb = with_blk(members)
    pairs = (
        sb.select("cell", "blk").distinct().alias("x")
        .join(
            mb.select("cell", "blk").distinct().alias("y"),
            F.col("x.cell") == F.col("y.cell"),
        )
        .select(
            F.col("x.cell").alias("cell"),
            F.col("x.blk").alias("ba"),
            F.col("y.blk").alias("bb"),
        )
    )
    left = (
        sb.alias("l")
        .join(
            F.broadcast(pairs.alias("pl")),
            (F.col("l.cell") == F.col("pl.cell"))
            & (F.col("l.blk") == F.col("pl.ba")),
        )
        .select("pl.cell", "pl.ba", "pl.bb", "l.vid", "l.q", "l.norm_sq")
    )
    right = (
        mb.alias("r")
        .join(
            F.broadcast(pairs.alias("pr")),
            (F.col("r.cell") == F.col("pr.cell"))
            & (F.col("r.blk") == F.col("pr.bb")),
        )
        .select(
            F.col("pr.cell").alias("rcell"),
            F.col("pr.ba").alias("rba"),
            F.col("pr.bb").alias("rbb"),
            F.col("r.vid").alias("rvid"),
            F.col("r.q").alias("rq"),
            F.col("r.norm_sq").alias("rnorm_sq"),
        )
    )
    tile = _tile_topk_fn(k)
    cands = (
        left.groupby("cell", "ba", "bb")
        .cogroup(right.groupby("rcell", "rba", "rbb"))
        .applyInPandas(tile, "vec_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "rnk", "cosine")
    )


def knn_clusters(
    emb: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 2048,
    vec_scale: int = SCALE,
    graph: str = "exact",
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Mutual-kNN clustering: an undirected edge joins a and b iff
    b ∈ knn(a) AND a ∈ knn(b) — the mutuality requirement is what
    makes kNN graphs usable for grouping (a one-sided edge lets a hub
    vector chain unrelated regions together; mutual edges demand the
    affinity be reciprocal) — then connected components label every
    vector with the min member id of its group (singletons: their own
    id). The corpus-structure primitive on top of the graph builders:
    topic/near-source grouping, cluster-aware sampling, SemDeDup-style
    diversity analysis over any embedding column (including the
    feature-hashed text sketches).

    Plan shape: the graph build dominates (see ``knn_graph``; swap in
    ``knn_graph_ivf`` edges upstream for the cell-bounded scale path —
    components accept any pair relation); the mutual filter is one
    self-join of the k·n-row edge relation on the reversed key; the
    component walk is the cost-based union-find / min-label machinery
    shared with the text dedup family (operators.dedup)."""
    from . import dedup as _dedup

    # the graph feeds BOTH sides of the mutuality self-join — pin it
    # so the tile GEMM runs once, not twice. graph="ivf" swaps in the
    # cell-bounded builder (n_centroids/n_probe take effect): clusters
    # over probed edges only — mutuality and components are unchanged,
    # recall bounded exactly as knn_recall_report measures.
    if graph == "exact":
        built = knn_graph(emb, k, vec_col, id_col, block_size, vec_scale)
    elif graph == "ivf":
        built = knn_graph_ivf(
            emb, k, n_centroids, n_probe, 2, vec_col, id_col,
            block_size, vec_scale,
        )
    else:
        raise ValueError(f"unknown graph builder {graph!r}")
    g = built.select("vec_id", "neighbor_id").localCheckpoint(eager=False)
    mut = (
        g.alias("x")
        .join(
            g.alias("y"),
            (F.col("x.vec_id") == F.col("y.neighbor_id"))
            & (F.col("x.neighbor_id") == F.col("y.vec_id")),
            "left_semi",
        )
        .where(F.col("vec_id") < F.col("neighbor_id"))
        .select(
            F.col("vec_id").alias("va"), F.col("neighbor_id").alias("vb")
        )
    )
    comps = _dedup.connected_components(mut, src="va", dst="vb")
    return (
        emb.select(F.col(id_col).alias("vec_id"))
        .join(
            comps.withColumnRenamed("vertex", "vec_id"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).alias("cluster"),
        )
    )


def _sq_dist(q_col, c_col):
    """Exact integer squared L2 distance between two quantized vectors
    (components ≤ SCALE, so diff² ≤ 4e12 and a 64-dim sum stays far
    below 2^63)."""
    return F.aggregate(
        F.zip_with(q_col, c_col, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _floordiv(s, c):
    """Floor division via the pmod identity, exact on both engines:
    Spark's ``div`` truncates and DuckDB's ``//`` floors, which differ
    on negative sums — but (s - pmod(s, c)) is exactly divisible by c,
    where truncation, flooring, and true division coincide.

    KEPT AS THE DOCUMENTED SQL-SIDE IDENTITY: since the r13 rewrite
    the centroid fold runs driver-side (Python ``//`` floors the same
    exact int64 sums — see ``_kmeans_iterate``), so no plan references
    this expression anymore; the DuckDB oracle generators still mirror
    the identity and the unit tests pin the equivalence."""
    return (s - (((s % c) + c) % c)).cast("long") / c


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = SCALE,
) -> DataFrame:
    """Distributed Lloyd's k-means over quantized embeddings —
    integer-exact and therefore bit-reproducible against a DuckDB
    oracle that unrolls the same fixed iteration count.

    Everything float-hazardous is integer: components are micro-unit
    quantized (``scaled_vectors``), distances are integer squared L2,
    and centroid updates are element-wise FLOOR-division means (the
    pmod identity keeps Spark's truncating ``div`` and DuckDB's
    flooring ``//`` in agreement on negative sums). Ties break to the
    lower centroid id; empty cells keep their previous centroid.
    Init is the k vectors with the smallest md5(id||'|seed') —
    deterministic and SQL-mirrorable like a corpus prefix, but
    content-spread: ingest-ordered (e.g. sorted-by-source) corpora
    cannot seed every centroid from one source. Trained centroids
    plug into ``ivf_assignments``/``ann_ivf_topk`` via
    ``kmeans_centroids`` — the "production trains, then serves the
    same plan" loop.

    Plan shape per iteration (the 100 TB story):
    - assignment is ZERO-shuffle: the k centroids ride along as one
      broadcast array-of-structs row and ``array_max`` over
      (neg_dist, neg_id) structs IS the argmin — no crossJoin row
      inflation, no window;
    - the update is ONE map-side-combinable shuffle bounded by k×dim
      keys (posexplode → groupBy(cell, pos) sum/count), nothing like
      corpus size;
    - the k×dim partial sums are collected and folded DRIVER-side
      (bounded — see ``KMEANS_MAX_FOLD_CELLS``), so each round's
      centroid relation is a lineage-free k-row local DataFrame and
      consumers never re-execute training (``_kmeans_iterate``).

    NOTE: training executes EAGERLY at construction time (the
    per-round fold is a collect) — callers should hold on to the
    returned relation rather than rebuild the operator per consumer.

    Returns (vec_id, cell, dist_sq) under the FINAL centroids.
    """
    v = scaled_vectors(emb, vec_col, id_col, scale=scale).select(id_col, "q")
    cents = _kmeans_iterate(v, k, iters, id_col)
    return _kmeans_assign(v, cents, id_col).select(id_col, "cell", "dist_sq")


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The FINAL trained centroid relation from the same iteration as
    ``kmeans_cells``: (centroid_id, cq array<long>, cn norm_sq) — the
    shape ``ann_ivf_topk(centroids=...)`` plugs in, closing the
    train → index → search loop.

    NOTE: training executes EAGERLY here (the per-round fold is a
    collect — see ``_kmeans_iterate``); the returned relation is a
    lineage-free k-row local DataFrame. Cache/reuse it instead of
    calling this again per consumer."""
    v = scaled_vectors(emb, vec_col, id_col).select(id_col, "q")
    cents = _kmeans_iterate(v, k, iters, id_col)
    cn = F.aggregate(
        F.transform("cq", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return cents.withColumn("cn", cn)


def _seed_key(id_col: str):
    """Deterministic content-spread seed order: md5 of the id plus a
    domain tag — identical expression on both engines
    (md5(CAST(id AS VARCHAR) || '|seed'), lowercase hex, binary
    collation), so the picked seed SET is oracle-mirrorable."""
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit("|seed"))
    ).asc()


def _cents_df(spark, cents_local: dict[int, list[int]]) -> DataFrame:
    """(centroid_id, cq) relation from driver-local centroid state —
    k rows of metadata, no lineage, no job to materialize."""
    return spark.createDataFrame(
        [(int(cid), [int(x) for x in cq])
         for cid, cq in sorted(cents_local.items())],
        schema="centroid_id long, cq array<bigint>",
    )


# Hard cap on the k-means driver-side fold: the per-round partial-sum
# collect is k×dim rows (similarly m×ksub×subdim for the PQ codebook
# fold in operators.pq) — metadata-scale for every declared consumer
# (k ≤ 4096, dim ≤ 4096 ⇒ ≤ 16M cells ~ a few hundred MB at the
# absolute ceiling; real configs are ≤ 256×64). The guard makes the
# invariant explicit so an oversized k at 100 TB fails loudly instead
# of silently collecting data-scale rows to the driver.
KMEANS_MAX_FOLD_CELLS = 16_777_216


def _kmeans_iterate(
    v: DataFrame, k: int, iters: int, id_col: str
) -> DataFrame:
    """``iters`` Lloyd rounds over the quantized relation ``v``
    (id, q); returns the final (centroid_id, cq) relation.

    Per-round shape (r13): assignment stays the zero-shuffle
    broadcast-attach projection, and the update's k×dim partial sums
    — ONE map-side-combinable shuffle bounded by k×dim keys, nothing
    like corpus size — are COLLECTED and folded driver-side (exact
    Python-int floor division ≡ the engines' ``_floordiv`` pmod
    identity; empty cells keep their previous centroid). k×dim is
    metadata-scale by construction (the same discipline as the
    probe-cell and codebook collects), so this replaces the previous
    per-round collect_list re-aggregation + left-join +
    localCheckpoint chain — 2 extra exchanges and a checkpoint per
    round — with one collect, and the final centroid relation is a
    driver-local k-row DataFrame with NO lineage for consumers to
    re-execute. Values are bit-identical: int64 sums are exact and
    the fold order never matters."""
    seed_rows = (
        v.orderBy(_seed_key(id_col), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("centroid_id"), F.col("q").alias("cq"))
        .collect()
    )
    # Content-spread deterministic seeding: the k vectors with the
    # smallest md5(id||'|seed') — still pure and SQL-mirrorable (the
    # oracle doctrine), but DECORRELATED from ingest order, unlike the
    # previous ids < k prefix, which could seed every centroid from
    # one source on a sorted-by-source corpus. orderBy+limit is a
    # distributed TakeOrdered top-k, never a global window. It also
    # removes the old sparse-id-space hole (ids all >= k -> zero
    # seeds): any non-empty corpus now seeds min(n, k) centroids —
    # only a fully EMPTY corpus is degenerate, and that fails loudly.
    if not seed_rows:
        raise ValueError(
            "k-means seeding found an empty vector relation: nothing "
            "to cluster"
        )
    cents_local = {
        int(r["centroid_id"]): list(r["cq"]) for r in seed_rows
    }
    # The driver-side fold is sound ONLY while k×dim stays
    # metadata-scale; every declared consumer satisfies that by
    # construction, but an oversized k at 100 TB would otherwise
    # silently collect data-scale rows — fail loudly instead.
    dim = len(next(iter(cents_local.values())))
    if k * dim > KMEANS_MAX_FOLD_CELLS:
        raise ValueError(
            f"k-means driver-side fold bound exceeded: k×dim = "
            f"{k}×{dim} = {k * dim} > {KMEANS_MAX_FOLD_CELLS}; "
            "the per-round partial-sum collect is only metadata-"
            "scale while k×dim is — shrink k or raise "
            "KMEANS_MAX_FOLD_CELLS deliberately"
        )
    spark = v.sparkSession
    for _ in range(iters):
        cents = _cents_df(spark, cents_local)
        assigned = _kmeans_assign(v, cents, id_col)
        sums = (
            assigned.select("cell", F.posexplode("q").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        per_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            per_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = (
                int(r["s"]),
                int(r["n"]),
            )
        for cell, by_pos in per_cell.items():
            # Python // floors, exactly the engines' pmod-identity
            # floor division (_floordiv) on the same exact integers
            cents_local[cell] = [
                s // n for _, (s, n) in sorted(by_pos.items())
            ]
    return _cents_df(spark, cents_local)


def _kmeans_assign(v: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Zero-shuffle argmin assignment of ``v`` against the k-row
    centroid relation (broadcast array-of-structs attach)."""

    def cents_row(c: DataFrame):
        return F.broadcast(
            c.select(
                F.struct(
                    F.col("centroid_id").alias("centroid_id"),
                    F.col("cq").alias("cq"),
                ).alias("c")
            ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
        )

    scored = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            (-_sq_dist(F.col("q"), s["cq"])).alias("neg_d"),
            (-s["centroid_id"]).alias("neg_cid"),
        ),
    )
    best = F.array_max(scored)
    return v.crossJoin(cents_row(cents)).select(
        id_col,
        "q",
        (-best["neg_cid"]).alias("cell"),
        (-best["neg_d"]).alias("dist_sq"),
    )


def _kmeans_probe(
    v: DataFrame, cents: DataFrame, id_col: str, n_probe: int
) -> DataFrame:
    """Zero-shuffle top-``n_probe`` cell assignment — the multi-probe
    generalization of ``_kmeans_assign``: the same broadcast
    array-of-structs attach, sorted ascending by (dist_sq,
    centroid_id) and sliced, one output row per (vector, probed cell).
    ``n_probe=1`` reproduces the argmin assignment exactly."""

    def cents_row(c: DataFrame):
        return F.broadcast(
            c.select(
                F.struct(
                    F.col("centroid_id").alias("centroid_id"),
                    F.col("cq").alias("cq"),
                ).alias("c")
            ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
        )

    scored = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            _sq_dist(F.col("q"), s["cq"]).alias("d"),
            s["centroid_id"].alias("cid"),
        ),
    )
    probed = F.slice(F.array_sort(scored), 1, n_probe)
    return v.crossJoin(cents_row(cents)).select(
        id_col, "q", F.explode(probed["cid"]).alias("cell")
    )


def embedding_decontaminate(
    emb: DataFrame,
    rate: float = 0.05,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "eval",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic twin
    of ``dedup.ngram_decontaminate``: flag corpus vectors whose cosine
    against ANY held-out eval vector reaches ``threshold``
    (paraphrased leaks that share no 8-grams still sit next to their
    source in embedding space). Eval membership is the deterministic
    md5 sample (``partitioning.hash_sample`` semantics, same salt
    convention as the n-gram pass).

    Plan: the eval set rides as ONE broadcast array-of-structs row
    (same shape as the IVF centroid attach); each corpus row computes
    its max cosine over the eval array inside a single projection —
    zero shuffle, zero row inflation, one corpus scan. Exact integer
    dot products over micro-unit quantized components, the identical
    IEEE association order as the SQL formula. Eval members are never
    flagged; rows with no other eval vector report -1.0.

    At a 100 TB corpus the per-row cost is |eval|·dim multiplies —
    intrinsic to the exact contract; an LSH pre-bucketing (hyperplane
    buckets shared between corpus and eval) is the approximate scale
    path, same as the ANN family. ``rate`` is the boundedness knob
    (the same caller contract as ``num_queries`` in the ANN paths and
    the benchmark-sized eval set in ``broadcast_eval_grams``): the
    eval array is one aggregated row, so rate × corpus must stay
    broadcast-sized — hold the eval set fixed (a benchmark, not a
    corpus fraction) when the corpus grows.
    """
    from ..functions.text import md5_long
    from .partitioning import SAMPLE_DENOM

    v = scaled_vectors(emb, vec_col, id_col)
    bucket = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    ) % SAMPLE_DENOM
    is_eval = bucket < int(rate * SAMPLE_DENOM)
    ev = v.filter(is_eval)
    evarr = F.broadcast(
        ev.select(
            F.struct(
                F.col(id_col).alias("eid"),
                F.col("q").alias("eq"),
                F.col("norm_sq").alias("en"),
            ).alias("e")
        ).agg(F.array_sort(F.collect_list("e")).alias("evals"))
    )
    others = F.filter(F.col("evals"), lambda e: e["eid"] != F.col(id_col))
    coss = F.transform(
        others,
        lambda e: _dot(F.col("q"), e["eq"])
        / (
            F.sqrt(F.col("norm_sq").cast("double"))
            * F.sqrt(e["en"].cast("double"))
        ),
    )
    mx = F.array_max(coss)
    return v.crossJoin(evarr).select(
        id_col,
        is_eval.alias("is_eval"),
        F.coalesce(mx, F.lit(-1.0)).alias("max_eval_cosine"),
        (~is_eval & F.coalesce(mx >= F.lit(threshold), F.lit(False))).alias(
            "contaminated"
        ),
    )


SEMDEDUP_MAX_CELL_ROWS = 100_000


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_rows: int = SEMDEDUP_MAX_CELL_ROWS,
    block_size: int = 2048,
    scale: int = SCALE,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering —
    k-means partitions the embedding space, near-duplicate pairs are
    searched ONLY within each cell, and every near-dup component keeps
    the member FARTHEST from its centroid (the paper's
    low-centroid-similarity keep; min-id tiebreak for determinism).

    This is the scale path ``cosine_neardup_pairs`` documents: that
    operator's exact all-pairs GEMM inflates the corpus O(#blocks)
    times, while here pair search is confined to cells — cost
    Σ|cell|², controlled by ``k`` (set k ≈ N/target_cell_size; the
    paper runs 50k cells over 5B embeddings). Detection is
    recall-bounded by the clustering exactly like LSH banding bounds
    MinHash: a cross-cell near-dup pair is not examined.

    Plan shape: clustering is the integer-exact ``kmeans_cells``
    (broadcast-argmin assignment, k×dim-bounded update shuffle);
    pair search is ONE groupBy(cell) Arrow stage — a per-cell int64
    GEMM with the same micro-unit quantization and IEEE association
    order as ``cosine_neardup_pairs``, so the threshold decision is
    bit-identical to the SQL oracle; components + keeper selection
    are the same machinery as the text-dedup family.

    Returns (vec_id, cell, component, keeper_vec_id, is_keeper) for
    EVERY input vector — ``filter(is_keeper)`` is the deduplicated
    corpus.

    Degenerate clusterings are guarded: any cell over
    ``max_cell_rows`` is tiled into (cell, block)-pair GEMM tasks
    (the ``cosine_neardup_pairs`` tiles, keyed within the cell) so no
    single Arrow task ever owns an unbounded |cell|² product; output
    is identical by construction and by test.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .dedup import connected_components

    # Numeric ids are a hard requirement of the k-means stage (the
    # integer centroid-id tie-breaks and the keeper struct-max), not
    # just of this kernel — fail with the contract instead of a
    # confusing Arrow cast error deep in the job.
    id_type = emb.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"semdedup requires an integral {id_col} (integer "
            "centroid-id tie-breaks and keeper struct-max); got "
            f"{id_type.simpleString()}. Assign dense ids first "
            "(operators.dedup.dense_ids)."
        )

    v = scaled_vectors(emb, vec_col, id_col, scale=scale).select(
        id_col, "q", "norm_sq"
    )
    cells = kmeans_cells(
        emb, k, iters, vec_col, id_col, scale=scale
    ).localCheckpoint(eager=False)
    withcell = v.join(cells.select(id_col, "cell"), id_col)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        A = np.array([np.asarray(x, dtype=np.int64) for x in pdf["q"]])
        dots = A @ A.T  # exact int64 (micro-unit components, dot < 2^47)
        n = np.sqrt(pdf["norm_sq"].to_numpy(dtype=np.float64))
        # identical association order as the column/SQL formula:
        # dot / (sqrt(na) * sqrt(nb))
        cos = dots / (n[:, None] * n[None, :])
        ids = pdf[id_col].to_numpy()
        keep = (cos >= threshold) & (ids[:, None] < ids[None, :])
        ii, jj = np.nonzero(keep)
        return pd.DataFrame({"vec_a": ids[ii], "vec_b": ids[jj]})

    # Cost-based big-cell guard: a degenerate clustering (one cell
    # holding most of the corpus) would hand one Arrow task an
    # O(|cell|²) GEMM. Cell sizes are a k-row metadata relation —
    # collect them, and route any cell over ``max_cell_rows`` through
    # (cell, block)-pair tiling instead: the same tiles as
    # ``cosine_neardup_pairs``, keyed WITHIN the cell so semantics
    # (within-cell pairs only) are unchanged. Tested identical to the
    # single-task path on a forced-degenerate corpus.
    withcell = withcell.localCheckpoint(eager=False)
    big_cell_rows = (
        withcell.groupBy("cell")
        .count()
        .filter(F.col("count") > max_cell_rows)
        .collect()
    )
    big_cells = [r["cell"] for r in big_cell_rows]
    small = (
        withcell.filter(~F.col("cell").isin(big_cells))
        if big_cells
        else withcell
    )
    pairs = small.groupBy("cell").applyInPandas(
        cell_pairs, "vec_a long, vec_b long"
    )
    if big_cells:
        # Blocks are HASH-derived and sized from the (already
        # collected) per-cell counts — nblocks = ceil(|cell| /
        # block_size), blk = xxhash64(id) % nblocks — so each block
        # holds ~block_size rows regardless of id density. Keying
        # blocks on floor(id / block_size) would let a sparse id
        # space put ~one id per block and grow the broadcast
        # block-pair relation quadratically in occupied blocks
        # (the guard blowing itself up). The output pair set is
        # blocking-invariant: every unordered row pair inside a cell
        # lands in exactly one (ba <= bb) block pair.
        nblocks = {
            r["cell"]: -(-r["count"] // block_size) for r in big_cell_rows
        }
        nblk_expr = F.create_map(
            *[F.lit(x) for c in big_cells for x in (c, nblocks[c])]
        )[F.col("cell")]
        big = withcell.filter(F.col("cell").isin(big_cells)).withColumn(
            "blk", F.pmod(F.xxhash64(F.col(id_col)), nblk_expr).cast("long")
        )
        blks = big.select("cell", "blk").distinct()
        bp = (
            blks.alias("x")
            .join(
                blks.alias("y"),
                (F.col("x.cell") == F.col("y.cell"))
                & (F.col("x.blk") <= F.col("y.blk")),
            )
            .select(
                F.col("x.cell").alias("cell"),
                F.col("x.blk").alias("ba"),
                F.col("y.blk").alias("bb"),
            )
        )
        left = (
            big.alias("l")
            .join(
                F.broadcast(bp.alias("pl")),
                (F.col("l.cell") == F.col("pl.cell"))
                & (F.col("l.blk") == F.col("pl.ba")),
            )
            .select(
                "pl.cell", "pl.ba", "pl.bb", f"l.{id_col}", "l.q", "l.norm_sq"
            )
        )
        right = (
            big.alias("r")
            .join(
                F.broadcast(bp.alias("pr")),
                (F.col("r.cell") == F.col("pr.cell"))
                & (F.col("r.blk") == F.col("pr.bb")),
            )
            .select(
                F.col("pr.cell").alias("rcell"),
                F.col("pr.ba").alias("rba"),
                F.col("pr.bb").alias("rbb"),
                F.col(f"r.{id_col}").alias("rvid"),
                F.col("r.q").alias("rq"),
                F.col("r.norm_sq").alias("rnorm_sq"),
            )
        )

        def tile_pairs(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            if lpdf.empty or rpdf.empty:
                return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
            A = np.array([np.asarray(x, dtype=np.int64) for x in lpdf["q"]])
            B = np.array([np.asarray(x, dtype=np.int64) for x in rpdf["rq"]])
            dots = A @ B.T
            na = np.sqrt(lpdf["norm_sq"].to_numpy(dtype=np.float64))
            nb = np.sqrt(rpdf["rnorm_sq"].to_numpy(dtype=np.float64))
            cos = dots / (na[:, None] * nb[None, :])
            ia = lpdf[id_col].to_numpy()
            ib = rpdf["rvid"].to_numpy()
            # Blocks are hash-derived, NOT id-monotone: in an
            # off-diagonal tile (ba < bb) the lower id of a pair may
            # live on either side, so an ``ia < ib`` mask would drop
            # the pairs whose lower id hashed to the higher block.
            # Diagonal tiles (ba == bb) see the same rows on both
            # sides and keep the strict ``ia < ib`` triangle; off-
            # diagonal tiles keep every above-threshold cross pair
            # (blocks are disjoint, so ia != ib by construction) and
            # normalize to (min, max) ordering.
            diagonal = bool(lpdf["ba"].iloc[0] == lpdf["bb"].iloc[0])
            if diagonal:
                keep = (cos >= threshold) & (ia[:, None] < ib[None, :])
                ii, jj = np.nonzero(keep)
                return pd.DataFrame({"vec_a": ia[ii], "vec_b": ib[jj]})
            keep = (cos >= threshold) & (ia[:, None] != ib[None, :])
            ii, jj = np.nonzero(keep)
            a, b = ia[ii], ib[jj]
            return pd.DataFrame(
                {"vec_a": np.minimum(a, b), "vec_b": np.maximum(a, b)}
            )

        big_pairs = (
            left.groupby("cell", "ba", "bb")
            .cogroup(right.groupby("rcell", "rba", "rbb"))
            .applyInPandas(tile_pairs, "vec_a long, vec_b long")
        )
        pairs = pairs.unionByName(big_pairs)
    comps = connected_components(pairs, "vec_a", "vec_b")
    members = (
        cells.join(
            comps.withColumnRenamed("vertex", id_col), id_col, "left"
        )
        .select(
            id_col,
            "cell",
            "dist_sq",
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .localCheckpoint(eager=False)
    )
    # keeper = max dist_sq from the centroid, ties to the lower id
    # (struct max: (dist_sq, -id) lexicographic)
    keepers = members.groupBy("component").agg(
        (-F.max(F.struct(F.col("dist_sq"), (-F.col(id_col)).alias("_n")))[
            "_n"
        ]).alias("keeper_vec_id")
    )
    return members.join(keepers, "component").select(
        id_col,
        "cell",
        "component",
        "keeper_vec_id",
        (F.col(id_col) == F.col("keeper_vec_id")).alias("is_keeper"),
    )
