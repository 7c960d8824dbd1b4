"""Deterministic corpus-trained BPE-style subword tokenizer.

Everything that sizes training data — pack capacities, token budgets,
chunk windows — is denominated in TOKENIZER tokens, and whitespace
counts mis-size natural text by 1.3-2×. This module trains a small
byte-pair-encoding merge table from the corpus itself and counts
documents in the resulting subword units, so pack/budget decisions
use the same denomination the training run will.

The tokenizer is a deliberately simplified BPE (Sennrich et al. 2016
shape) whose every step is exactly mirrorable in SQL — the repo's
oracle doctrine — while keeping the real structure: learned merges,
frequency-ranked, applied lowest-rank-first:

- **Training** operates on the word-count dictionary (as real BPE
  training does), restricted to the top ``top_words`` words by
  (count DESC, word ASC) — a bounded, metadata-scale relation that is
  collected to the driver exactly like the decontamination eval grams
  (the repo's one sanctioned collect class). Each of ``n_merges``
  steps counts weighted adjacent symbol pairs over the current
  symbolizations, picks the best pair by (count DESC, encoded pair
  ASC), and merges its LEFTMOST occurrence in each word (one per word
  per step — the step is a closed-form list rewrite, which is what
  makes the unrolled-CTE SQL oracle possible; a pair that stays
  frequent is simply re-picked by later steps). The merge TABLE is
  the distinct picked pairs in first-pick order.
- **Application** segments each word by repeatedly finding the
  present pair with the lowest merge rank and merging its leftmost
  occurrence, until no table pair remains. It runs once per DISTINCT
  corpus word — the vocab-bounded relation (Heaps-law growth, the
  same boundedness class as the pruned LM model), never per token —
  as one shuffle-free Arrow ``mapInPandas`` pass with the ≤
  ``n_merges``-row table in the closure. Per-doc counts are then an
  equi-join on word + one map-side-combinable aggregate.

Pair encoding: ``left + chr(1) + right`` — the separator sorts below
every text character, so binary comparison of the encoded pair equals
tuple comparison of (left, right) in both engines (Spark/Python
compare code points, DuckDB compares UTF-8 bytes; identical order).

At 100 TB: training cost is one word-count aggregate (map-side
combinable) + driver work over ``top_words`` rows; application cost
is one distinct over corpus words + an embarrassingly parallel Arrow
pass + one key-partitioned join. Nothing all-pairs, nothing
driver-side beyond the bounded dictionary.

Beyond reference parity: the reference has no tokenizer surface; this
is LLM-pipeline extension surface (SURVEY.md §2 extension block).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

BPE_TOP_WORDS = 8192
BPE_MERGES = 64
PAIR_SEP = "\x01"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ws",
) -> DataFrame:
    """(word, wcnt) over lowercased tokens — ONE map-side combinable
    aggregate; the input relation of BPE training. ``token_mode=
    "mixed"`` pre-tokenizes no-whitespace scripts as char-1-grams
    (each CJK char a base word BPE can then merge — the standard
    CJK pre-tokenizer behavior)."""
    return (
        docs.select(
            F.explode(
                tokens(F.lower(F.col(text_col)), token_mode)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def _best_pair(vocab: list[tuple[list[str], int]]) -> str | None:
    """Encoded best pair by (weighted count DESC, encoded ASC), or
    None when no word has two symbols left. Full recount — kept as
    the reference implementation the incremental trainer's counts
    must equal at every step (asserted by tests/test_bpe.py)."""
    counts: dict[str, int] = {}
    for syms, cnt in vocab:
        for a, b in zip(syms, syms[1:]):
            enc = a + PAIR_SEP + b
            counts[enc] = counts.get(enc, 0) + cnt
    if not counts:
        return None
    return min(counts, key=lambda p: (-counts[p], p))


def _merge_leftmost(syms: list[str], left: str, right: str) -> list[str]:
    for i in range(len(syms) - 1):
        if syms[i] == left and syms[i + 1] == right:
            return syms[:i] + [left + right] + syms[i + 2 :]
    return syms


def train_merges(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    top_words: int = BPE_TOP_WORDS,
    text_col: str = "text",
    token_mode: str = "ws",
) -> list[str]:
    """The learned merge table: ≤ ``n_merges`` encoded pairs in
    first-pick order (rank = list position). Deterministic: the top
    dictionary, every pair count, and every tie-break are pure
    functions of the corpus."""
    top = (
        word_counts(docs, text_col, token_mode=token_mode)
        # a word containing the \x01 pair separator would make encoded
        # pairs ambiguous (best.split would see >2 parts and crash) —
        # exclude such words from the TRAINING dictionary; application
        # still segments them safely (their pair keys simply never
        # match the clean table). Mirrored in the oracle's v0 CTE.
        .where(~F.col("word").contains(PAIR_SEP))
        .orderBy(F.col("wcnt").desc(), F.col("word").asc())
        .limit(top_words)
        .collect()
    )
    vocab = [(list(r["word"]), int(r["wcnt"])) for r in top]
    # Incremental pair maintenance: a full recount per merge is
    # O(n_merges × top_words × |word|) driver work — minutes at a
    # real 32k-merge vocabulary. Only the words CONTAINING the picked
    # pair change per step, so keep (a) the weighted pair counts and
    # (b) an inverted index pair -> word ids, and apply exact count
    # deltas for just the rewritten words. The counts dict equals the
    # full recount at every step (asserted in tests), so picks and
    # tie-breaks — hence the learned table and the unrolled-CTE
    # oracle — are unchanged.
    from collections import Counter

    def word_pairs(syms: list[str]) -> list[str]:
        return [a + PAIR_SEP + b for a, b in zip(syms, syms[1:])]

    counts: dict[str, int] = {}
    index: dict[str, set[int]] = {}
    for wi, (syms, cnt) in enumerate(vocab):
        for enc in word_pairs(syms):
            counts[enc] = counts.get(enc, 0) + cnt
            index.setdefault(enc, set()).add(wi)
    merges: list[str] = []
    seen: set[str] = set()
    for _ in range(n_merges):
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if best not in seen:
            seen.add(best)
            merges.append(best)
        left, right = best.split(PAIR_SEP)
        # the index may hold stale entries (a word that no longer
        # contains the pair after earlier rewrites); _merge_leftmost
        # returning the input unchanged makes those no-ops
        for wi in index.get(best, ()):
            syms, cnt = vocab[wi]
            new = _merge_leftmost(syms, left, right)
            if new is syms or new == syms:
                continue
            delta = Counter(word_pairs(new))
            delta.subtract(word_pairs(syms))
            for enc, d in delta.items():
                if d == 0:
                    continue
                c = counts.get(enc, 0) + d * cnt
                if c > 0:
                    counts[enc] = c
                    if d > 0:
                        index.setdefault(enc, set()).add(wi)
                else:
                    counts.pop(enc, None)
            vocab[wi] = (new, cnt)
    return merges


def save_merges(spark, merges: list[str], path: str) -> None:
    """Persist a learned merge table as a parquet relation
    (rank int, pair string) — the tokenizer ARTIFACT. The merge list
    is the tokenizer: rank order is semantic (application always
    merges the lowest-rank present pair first), so the relation
    carries explicit ranks rather than relying on row order. Write
    mode is ``error``: artifacts are immutable once written (the same
    versioning discipline as the dataset snapshots they denominate)."""
    rows = [(i, p) for i, p in enumerate(merges)]
    spark.createDataFrame(rows, "rank int, pair string").coalesce(
        1
    ).write.mode("error").parquet(path)


def load_merges(spark, path: str) -> list[str]:
    """Load a persisted merge table back into the list form every
    operator here consumes. Validates rank density so a corrupted or
    partially-written artifact fails loudly instead of silently
    reordering the tokenizer."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    ranks = [r["rank"] for r in rows]
    if ranks != list(range(len(rows))):
        raise ValueError(
            f"corrupt merge table at {path}: ranks {ranks[:8]}... are "
            f"not dense from 0 (n={len(rows)})"
        )
    return [r["pair"] for r in rows]


def merges_fingerprint(merges: list[str]) -> str:
    """Order-SENSITIVE content fingerprint of a merge table,
    ``<n>_<md5 prefix>`` — rank order changes segmentation, so unlike
    the dataset-relation fingerprints this one must NOT be
    permutation-invariant. Used by DatasetBuilder's epoch config
    guard (a rebuild under a different tokenizer must refuse) and as
    the artifact directory name."""
    import hashlib

    h = hashlib.md5("\x02".join(merges).encode()).hexdigest()[:16]
    return f"{len(merges)}_{h}"


def segment_len(word: str, merges: list[str]) -> int:
    """Subword count of one word under the merge table: repeatedly
    merge the leftmost occurrence of the lowest-rank present pair.
    Pure function — the single definition both the Arrow pass and the
    tests call."""
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best_r = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = rank.get(syms[i] + PAIR_SEP + syms[i + 1])
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def segment_words(words: DataFrame, merges: list[str]) -> DataFrame:
    """(word, n_bpe) for every row of the (distinct) ``words``
    relation — one shuffle-free Arrow pass, merge table in the
    closure (≤ n_merges strings, broadcast with the task)."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_bpe": [
                        segment_len(w, merges) for w in pdf["word"]
                    ],
                }
            )

    return words.mapInPandas(seg, "word string, n_bpe int")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ws",
) -> DataFrame:
    """Per-doc token counts in the learned subword denomination:
    (id, n_ws_tokens, n_bpe_tokens), zero-token docs included with
    zeros. Plan: explode words (narrow) → distinct-word segmentation
    (Arrow pass over the vocab-bounded relation) → key-partitioned
    equi-join → one map-side-combinable per-doc aggregate."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            tokens(F.lower(F.col(text_col)), token_mode)
        ).alias("word"),
    )
    seg = segment_words(words.select("word").distinct(), merges)
    per_doc = (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_ws_tokens", F.lit(0)).cast("long").alias(
            "n_ws_tokens"
        ),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )


def bpe_coverage(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    token_mode: str = "ws",
) -> DataFrame:
    """One-row vocabulary-coverage report for a learned merge table —
    the train-time health stat that says whether ``n_merges`` was
    worth it on THIS corpus: (n_tokens, covered_tokens,
    coverage_permille, bpe_char_permille).

    A corpus (whitespace) token is COVERED when at least one learned
    merge applies to its word (``n_bpe < length(word)`` — its
    segmentation is shorter than raw characters); coverage_permille =
    covered/total in integer permille. ``bpe_char_permille`` is the
    aggregate compression ratio Σ wcnt·n_bpe / Σ wcnt·len(word) —
    1000 means the table did nothing, real tables push well below.
    Integer ``div`` permilles keep the row hash-exact vs the oracle.

    Plan: ONE word-count aggregate (map-side combinable) + the
    vocab-bounded Arrow segmentation pass + a single global
    aggregate — metadata-scale output, corpus-scale input never
    reshuffled."""
    wc = word_counts(docs, text_col, token_mode=token_mode)
    seg = segment_words(wc.select("word"), merges)
    return (
        wc.join(seg, "word")
        .agg(
            F.sum("wcnt").cast("long").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("n_bpe") < F.length("word"), F.col("wcnt")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("covered_tokens"),
            F.sum(F.col("wcnt") * F.col("n_bpe")).alias("_wb"),
            F.sum(F.col("wcnt") * F.length("word")).alias("_wchars"),
        )
        .select(
            "n_tokens",
            "covered_tokens",
            F.expr("covered_tokens * 1000 div n_tokens")
            .cast("long")
            .alias("coverage_permille"),
            F.expr("_wb * 1000 div _wchars")
            .cast("long")
            .alias("bpe_char_permille"),
        )
    )


def bpe_chunk_documents(
    docs: DataFrame,
    merges: list[str],
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ws",
) -> DataFrame:
    """Sliding-window chunking DENOMINATED IN BPE TOKENS: windows
    cover ``chunk_tokens`` subword tokens with stride
    ``chunk_tokens - overlap``, but boundaries fall on whole words (a
    word whose subword span intersects a window belongs to it — the
    greedy convention every subword chunker uses, so a window may
    slightly exceed the target where a word straddles its edge).
    Whitespace-denominated ``text_profile.chunk_documents`` mis-sizes
    context windows by the same 1.3-2× factor that motivates the BPE
    counts; this is the chunker a RAG/pretraining pipeline would
    actually run.

    Chunk count per doc follows the same closed form as the
    whitespace chunker (1 if total ≤ C else ⌈(total-C)/S⌉ + 1) over
    the doc's TOTAL BPE tokens, so the final window reaches the
    document's end. Zero-token docs emit one empty chunk. Corollary
    of never splitting words: a word whose subword span is WIDER than
    the stride belongs to every window it intersects, so a
    pathological single giant word repeats verbatim in each of its
    windows (each window is still a faithful view of the tokens it
    covers); every chunk remains non-empty and chunk ids contiguous.

    Plan: posexplode words (narrow) → distinct-word segmentation
    (vocab-bounded Arrow pass) → equi-join → per-DOC windows (cum
    subword starts; partitioned by id, never global) → a ≤
    spans-per-word explode → one groupBy(id, chunk) with a
    sort_array'd collect_list for deterministic word order. No
    global windows, no all-pairs.

    Returns (id, chunk_id, chunk_text, n_chunk_words, n_chunk_bpe).
    """
    from pyspark.sql import Window

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    words = docs.select(
        F.col(id_col),
        F.posexplode(
            tokens(F.col(text_col), token_mode)
        ).alias("pos", "word"),
    ).withColumn("lword", F.lower(F.col("word")))
    seg = segment_words(
        words.select(F.col("lword").alias("word")).distinct(), merges
    ).select(F.col("word").alias("lword"), "n_bpe")
    w_doc = Window.partitionBy(id_col)
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spanned = (
        words.join(seg, "lword")
        .withColumn("s", F.coalesce(F.sum("n_bpe").over(w_cum), F.lit(0)))
        .withColumn("tot", F.sum("n_bpe").over(w_doc))
        .withColumn(
            # integer `div` like c_lo/c_hi and the oracle's `//` — a
            # float divide then int cast could double-round away from
            # the closed form at extreme per-doc totals
            "n_chunks",
            F.when(F.col("tot") <= chunk_tokens, F.lit(1)).otherwise(
                F.expr(
                    f"(tot - {chunk_tokens} + {stride} - 1) "
                    f"div {stride} + 1"
                )
            ).cast("int"),
        )
        .withColumn(
            "c_lo",
            F.when(
                F.col("s") >= chunk_tokens,
                F.expr(f"(s - {chunk_tokens} + {stride}) div {stride}"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "c_hi",
            F.least(
                F.expr(f"(s + n_bpe - 1) div {stride}"),
                (F.col("n_chunks") - 1).cast("long"),
            ),
        )
        .select(
            id_col, "pos", "word", "n_bpe",
            F.explode(F.sequence("c_lo", "c_hi")).alias("chunk_id"),
        )
    )
    chunks = (
        spanned.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda st: st["word"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_chunk_words"),
            F.sum("n_bpe").alias("n_chunk_bpe"),
        )
    )
    # zero-token docs emit one empty chunk, like the whitespace
    # chunker — every doc appears
    empties = (
        docs.join(chunks.select(id_col).distinct(), id_col, "left_anti")
        .select(
            id_col,
            F.lit(0).cast("int").alias("chunk_id"),
            F.lit("").alias("chunk_text"),
            F.lit(0).cast("long").alias("n_chunk_words"),
            F.lit(0).cast("long").alias("n_chunk_bpe"),
        )
    )
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "chunk_text",
        F.col("n_chunk_words").cast("long").alias("n_chunk_words"),
        F.col("n_chunk_bpe").cast("long").alias("n_chunk_bpe"),
    ).unionByName(empties)


def merge_table(docs: DataFrame, merges: list[str]) -> DataFrame:
    """The learned merge table as a relation: (rank, left, right) —
    the ≤ n_merges-row artifact a deployment would persist next to
    the dataset snapshot."""
    spark = docs.sparkSession
    rows = [
        (i, *p.split(PAIR_SEP)) for i, p in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, pair_left string, pair_right string"
    )
