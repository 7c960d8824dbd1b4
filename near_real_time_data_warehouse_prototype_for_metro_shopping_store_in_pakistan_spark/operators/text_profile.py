"""Document profiling operators: token stats, language ID, quality
scoring, fingerprints — all built-in column expressions (JVM-side),
each with an exact DuckDB oracle.

Determinism: counts are integers; ratios are divisions of identical
integers (same double on every engine); no fractional rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    ENGLISH_STOPWORDS,
    LANG_ORDER,
    LANG_STOPWORDS,
    fingerprint,
    md5_long,
    normalized,
    punct_count,
    tokens,
)


def _hits(toks: Column, words: list[str]) -> Column:
    w = F.array(*[F.lit(x) for x in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(w, t)))


def token_stats(
    docs: DataFrame, text_col: str = "text", token_mode: str = "ws"
) -> DataFrame:
    toks = tokens(F.col(text_col), token_mode)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(text_col).cast("int").alias("n_chars_measured"),
        punct_count(F.col(text_col)).cast("int").alias("n_punct"),
    )


# The 13-language ID machinery, array-shaped (r13): one bitmask map
# lookup per TOKEN (each stopword's value has a bit per language that
# lists it — overlapping lists count for each, exactly like the
# per-list membership tests they replace), ONE aggregate pass builds
# all 13 hit counts, and the argmax is array_position(max) with
# first-index-wins — the same LANG_ORDER tie-break the old 13x12
# comparison CASE chain encoded. Two measured wins over the
# column-per-language form, values identical by construction: the
# per-token work drops from 13 list-membership string scans to one
# hash lookup + 13 bit tests, and the generated code shrinks from
# ~170 inlined comparisons to a handful of array kernels (first-run
# codegen ~2x faster, steady-state ~2x).


def _stopword_mask_map() -> Column:
    """token -> bitmask-of-languages literal map (~80 entries)."""
    mask: dict[str, int] = {}
    for i, lang in enumerate(LANG_ORDER):
        for w in LANG_STOPWORDS[lang]:
            mask[w] = mask.get(w, 0) | (1 << i)
    return F.create_map(
        *[F.lit(x) for kv in sorted(mask.items()) for x in kv]
    )


def _lang_hits_array(masks: Column) -> Column:
    """array<long>[13] of per-language stopword hits from the
    projected per-token bitmask column — one pass over the tokens."""
    n = len(LANG_ORDER)
    bits = F.array(*[F.lit(1 << i).cast("long") for i in range(n)])
    return F.aggregate(
        masks,
        F.array_repeat(F.lit(0).cast("long"), n),
        lambda acc, mk: F.zip_with(
            acc,
            bits,
            lambda a, b: a
            + F.when(mk.bitwiseAND(b) != 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        ),
    )


def _lang_scores_array(hits: Column, residue: Column) -> Column:
    """array<long>[13] of ID scores: stopword hits dominate
    (x LANG_SCORE_SCALE), the script prior — capped char count in the
    language's distinctive ranges, scanned over the single-pass
    ``script_residue`` column — decides when no stopword fires.
    Latin-script languages carry no prior (a shared script identifies
    nothing), so ASCII corpora keep their pre-r12 argmax exactly."""
    from ..functions.text import LANG_SCORE_SCALE, LANG_SCRIPTS, script_hits

    def one(i: int, lang: str) -> Column:
        score = F.element_at(hits, i + 1) * F.lit(
            LANG_SCORE_SCALE
        ).cast("long")
        ranges = LANG_SCRIPTS.get(lang)
        if ranges:
            score = score + F.least(
                script_hits(residue, ranges),
                F.lit(LANG_SCORE_SCALE - 1).cast("long"),
            )
        return score

    return F.array(*[one(i, lang) for i, lang in enumerate(LANG_ORDER)])


def _argmax_lang(scores: Column) -> Column:
    """First language (LANG_ORDER priority) holding the max score —
    array_position returns the FIRST index of the max, which is
    exactly the earliest-wins tie-break the old comparison chain
    implemented."""
    langs = F.array(*[F.lit(lang) for lang in LANG_ORDER])
    return F.element_at(
        langs, F.array_position(scores, F.array_max(scores)).cast("int")
    )


def language_id(
    docs: DataFrame, text_col: str = "text", token_mode: str = "ws"
) -> DataFrame:
    """Stopword-hit + script-prior language ID with a fixed-priority
    argmax (LANG_ORDER breaks ties) — deterministic and oracle-exact
    across the 13-language matrix (functions.text.LANG_STOPWORDS /
    LANG_SCRIPTS). ``token_mode="mixed"`` keeps the stopword hits
    correct on corpora mixing no-whitespace scripts (a CJK run no
    longer glues onto an adjacent Latin stopword — and ja's kana
    particles only match as char-1-grams in this mode); the script
    priors are token-mode-independent (raw char counts).

    Plan shape: token array, per-token stopword bitmask, script
    residue, and the hits array are each projected ONCE per row
    (separate Project steps Catalyst keeps — expensive expressions
    referenced many times are not re-inlined): 1 tokenize + 1 map
    lookup per token + 1 full-text regex pass per doc, instead of
    13 list-membership scans + 7 regex passes."""
    from ..functions.text import script_residue

    m = _stopword_mask_map()
    staged = docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        tokens(F.lower(F.col(text_col)), token_mode).alias("__toks"),
        script_residue(F.col(text_col)).alias("__scripts"),
    )
    masked = staged.select(
        "doc_id",
        "lang_true",
        "__scripts",
        F.transform(
            F.col("__toks"),
            lambda t: F.coalesce(m[t], F.lit(0).cast("long")),
        ).alias("__masks"),
    )
    arred = masked.select(
        "doc_id",
        "lang_true",
        "__scripts",
        _lang_hits_array(F.col("__masks")).alias("__hits"),
    )
    out = arred.select(
        "doc_id",
        "lang_true",
        *[
            F.element_at("__hits", i + 1)
            .cast("int")
            .alias(f"hits_{lang}")
            for i, lang in enumerate(LANG_ORDER)
        ],
        _lang_scores_array(
            F.col("__hits"), F.col("__scripts")
        ).alias("__scores"),
    )
    return out.withColumn(
        "lang_pred", _argmax_lang(F.col("__scores"))
    ).drop("__scores")


def _quality_expr(n_tokens: Column, n_chars: Column, n_punct: Column,
                  stop_hits: Column) -> Column:
    """THE heuristic quality score (length band 40 + punct ratio 30 +
    stopword density 30) — single definition shared by
    ``quality_scores``, ``curation_flags`` and ``corpus_health`` so
    the three surfaces cannot drift."""
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    return (
        F.when((n_tokens >= 10) & (n_tokens <= 1000), 40).otherwise(0)
        + F.when(punct_ratio <= 0.1, 30).otherwise(0)
        + F.when(stop_ratio >= 0.02, 30).otherwise(0)
    )


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ws",
) -> DataFrame:
    """Heuristic quality: length band + punctuation ratio + stopword
    density, combined into an integer 0-100 score. ``token_mode=
    "mixed"`` makes the length band and densities meaningful on
    no-whitespace scripts (a 500-char CJK doc is 500 tokens, not 1)."""
    toks = tokens(F.lower(F.col(text_col)), token_mode)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col).cast("int")
    n_punct = punct_count(F.col(text_col)).cast("int")
    stop_hits = _hits(toks, ENGLISH_STOPWORDS)
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = _quality_expr(n_tokens, n_chars, n_punct, stop_hits)
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.cast("int").alias("quality_score"),
    )


def adaptive_quality_keep(
    scored: DataFrame,
    score_col: str,
    group_col: str = "source",
    keep_fraction: float = 0.9,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group ADAPTIVE quality gate: within each ``group_col``
    value (source / crawl dump / language), drop the bottom
    ``floor(n · (1 - keep_fraction))`` docs by ``score_col`` and keep
    the rest — a distribution-free threshold that adapts to each
    group's own score distribution (a fixed global cutoff under-prunes
    clean sources and guts noisy ones; FineWeb-style per-dump
    filtering). Deterministic: rank = row_number over (score asc,
    id asc), so ties at the cut line resolve by id and both engines
    agree exactly — no float quantile interpolation anywhere.

    Returns the KEPT rows of ``scored`` plus ``group_rank`` (1-based
    ascending rank within the group) and ``group_n``. Plan shape: one
    window over (group, score, id) — a single shuffle on the group
    key; at 100 TB partition counts follow the number of groups ×
    AQE splits, and a heavily-skewed single group degrades to one
    sorted partition (the standard window trade-off; pre-aggregate
    score histograms if a group outgrows an executor).

    ``keep_fraction`` resolves to PERMILLE (round(1000·(1-kf))) and
    the drop count is the exact integer (n · drop_permille) div 1000
    — floating 1.0-0.8 is 0.19999…96, and flooring n times THAT
    drops zero of five where "20% of 5" means one.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(
            f"keep_fraction ({keep_fraction}) must be in (0, 1]"
        )
    drop_permille = int(round((1.0 - keep_fraction) * 1000))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    ranked = scored.withColumn(
        "group_rank", F.row_number().over(w)
    ).withColumn("group_n", F.count(F.lit(1)).over(wn))
    n_drop = F.expr(f"(group_n * {drop_permille}) div 1000")
    return ranked.filter(F.col("group_rank") > n_drop)


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", appendix A.1.1 — the MassiveText document-quality
# rules). Word-count bounds are parameters (the paper's 50..100k fits
# web pages, not every corpus); the ratio rules are fixed as
# published: mean word length in [3, 10], symbol-to-word <= 0.1,
# >= 80% of words alphabetic, < 90% bullet lines, < 30% ellipsis
# lines, >= 2 distinct required stop words.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_BULLET_PREFIXES = ("- ", "* ", "• ")


def gopher_gates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    required_words: list[str] | None = None,
    min_required: int = 2,
    token_mode: str = "ws",
) -> DataFrame:
    """The Gopher/MassiveText document-quality rules as ONE projection
    over one scan — every rule an integer-exact column expression
    (ratio thresholds cross-multiplied, no float division), so the
    gate runs at 100 TB as a narrow map and has an exact SQL oracle.

    Returns (id, n_words, plus one boolean per rule, gopher_ok =
    conjunction). Line rules (bullets/ellipsis) evaluate over newline
    lines and PASS vacuously for single-line docs (0 lines counted ->
    0 <= threshold), matching the paper's web-page framing.
    ``required_words`` defaults to the paper's 8-word English set —
    a corpus in another language (or a synthetic vocabulary) passes
    its own list, as the word-count bounds already parameterize.

    ``token_mode="mixed"`` makes the word-denominated rules sane on
    no-whitespace scripts (each CJK/Thai char is a word-1-gram, so a
    CJK page is no longer ~1 giant "word" that fails every bound).
    Two rules adapt with it (declared deviations, the standard moves
    when Gopher is applied beyond Latin corpora): the alphabetic rule
    counts any Unicode letter, not [a-z] (an ideograph IS the word's
    letter), and the mean-word-length band applies only to words
    containing a Latin letter — char-1-grams are length 1 by
    construction, so including them would cut every CJK page; with no
    Latin words the band passes vacuously (like the line rules at 0
    lines)."""
    if required_words is None:
        required_words = GOPHER_REQUIRED_WORDS
    t = F.col(text_col)
    toks = tokens(F.lower(t), token_mode)
    n_words = F.size(toks)
    len_toks = (
        toks
        if token_mode == "ws"
        else F.filter(toks, lambda x: x.rlike("[a-z]"))
    )
    n_len_words = F.size(len_toks)
    word_chars = F.aggregate(
        F.transform(len_toks, lambda x: F.length(x)),
        F.lit(0),
        lambda a, x: a + x,
    )
    alpha_re = "[a-z]" if token_mode == "ws" else r"\p{L}"
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike(alpha_re)))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"(\.\.\.)"), 1))
    lines = F.filter(
        F.split(t, "\n"), lambda s: F.trim(s) != ""
    )
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda s: s.startswith(GOPHER_BULLET_PREFIXES[0])
            | s.startswith(GOPHER_BULLET_PREFIXES[1])
            | s.startswith(GOPHER_BULLET_PREFIXES[2]),
        )
    )
    ellipsis_lines = F.size(F.filter(lines, lambda s: s.endswith("...")))
    req = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in required_words]),
        )
    )
    symbols = n_hash + n_ellipsis
    out = docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("words_ok"),
        # 3 <= mean word length <= 10, cross-multiplied (over Latin
        # words only in mixed mode — see docstring)
        (
            (word_chars >= 3 * n_len_words)
            & (word_chars <= 10 * n_len_words)
        ).alias("mean_len_ok"),
        # symbol-to-word ratio <= 0.1
        (10 * symbols <= n_words).alias("symbol_ok"),
        # >= 80% of words contain an alphabetic character
        (5 * alpha_words >= 4 * n_words).alias("alpha_ok"),
        # <= 90% of lines start with a bullet (vacuous at 0 lines)
        (10 * bullet_lines <= 9 * n_lines).alias("bullet_ok"),
        # <= 30% of lines end with an ellipsis
        (10 * ellipsis_lines <= 3 * n_lines).alias("ellipsis_ok"),
        (req >= min_required).alias("required_words_ok"),
    )
    gates = [
        "words_ok", "mean_len_ok", "symbol_ok", "alpha_ok",
        "bullet_ok", "ellipsis_ok", "required_words_ok",
    ]
    ok = F.lit(True)
    for g in gates:
        ok = ok & F.col(g)
    return out.withColumn("gopher_ok", ok)


C4_TERMINAL_CHARS = (".", "!", "?", '"', "'")
C4_LOREM_MARKER = "lorem ipsum"


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmenter: str = "lines",
    words_per_segment: int = 8,
    min_words_per_line: int = 3,
    min_lines: int = 3,
    require_terminal: bool = False,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """The C4 cleaning rules (Raffel 2020 §2.2) as ONE projection —
    line-level corrections plus document gates, zero shuffles, so the
    pass runs at 100 TB as a narrow map over one scan:

    - LINE corrections (C4 keeps only "sentences": lines with >= 3
      words, optionally ending in terminal punctuation): a line/window
      survives iff it has >= ``min_words_per_line`` whitespace words
      and (when ``require_terminal``) ends in one of
      ``C4_TERMINAL_CHARS``. The segment unit is the shared
      ``dedup.segment_array`` expression — newline lines for web text,
      fixed word windows for corpora without newlines — and the filter
      runs INSIDE the array (no explode): the cleaned doc never leaves
      its row.
    - DOC gates: >= ``min_lines`` surviving lines (C4's "at least 3
      sentences"), no ``{`` (the code/markup proxy), no "lorem ipsum",
      and no token from ``blocklist`` (C4's policy word list —
      parameterized; default empty = vacuous, callers supply their
      policy; matching is case-folded on WHITESPACE tokens, so a
      listed word fused to punctuation is a declared miss — extend
      the list with punctuated variants where that matters).

    Returns (id, n_lines, n_kept_lines, lines_ok, brace_ok, lorem_ok,
    blocklist_ok, c4_ok, clean_text) for EVERY doc; a consumer keeps
    ``filter(c4_ok).select(id, clean_text)``. Gates report
    independently (a gated doc still shows its cleaned text) so the
    report doubles as the audit trail for what each rule would cut."""
    from .dedup import segment_array

    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line ({min_words_per_line}) must be >= 1"
        )
    blocklist = list(blocklist or [])
    t = F.col(text_col)
    sep = "\n" if segmenter == "lines" else " "
    lines = segment_array(t, segmenter, words_per_segment)

    def _line_ok(s: Column) -> Column:
        ok = F.size(tokens(s)) >= min_words_per_line
        if require_terminal:
            # C4 applies the terminal-punctuation rule to STRIPPED
            # lines; raw web text segments carry trailing \r (CRLF)
            # or spaces, which would silently cut every line (rtrim
            # alone only strips 0x20, so strip all trailing
            # whitespace explicitly)
            stripped = F.regexp_replace(s, r"\s+$", "")
            term = F.lit(False)
            for ch in C4_TERMINAL_CHARS:
                term = term | stripped.endswith(ch)
            ok = ok & term
        return ok

    kept = F.filter(lines, _line_ok)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    low = F.lower(t)
    if blocklist:
        block_hits = F.size(
            F.array_intersect(
                F.array_distinct(tokens(low)),
                F.array(*[F.lit(w.lower()) for w in blocklist]),
            )
        )
        blocklist_ok = block_hits == 0
    else:
        blocklist_ok = F.lit(True)
    out = docs.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        (n_kept >= min_lines).alias("lines_ok"),
        (~low.contains("{")).alias("brace_ok"),
        (~low.contains(C4_LOREM_MARKER)).alias("lorem_ok"),
        blocklist_ok.alias("blocklist_ok"),
        F.array_join(kept, sep).alias("clean_text"),
    )
    return out.withColumn(
        "c4_ok",
        F.col("lines_ok") & F.col("brace_ok") & F.col("lorem_ok")
        & F.col("blocklist_ok"),
    )


def corpus_health(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """Per-source corpus health profile in ONE aggregate pass: doc and
    token counts, integer centi-mean quality, Gopher pass count, and
    the exact-duplicate surplus (docs minus distinct fingerprints) —
    the first dashboard a curation run reads before deciding which
    sources need which gates. Everything integer-exact: the mean is
    (sum·100) div n, dedup surplus counts distinct md5s, so the report
    hashes identically on any engine.

    Plan shape: one narrow projection (quality + gopher + fingerprint
    are column expressions) into one groupBy(source) with
    count-distinct — a single shuffle on the group key; at 100 TB the
    report costs one pass over the corpus."""
    toks = tokens(F.lower(F.col(text_col)))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col).cast("int")
    n_punct = punct_count(F.col(text_col)).cast("int")
    stop_hits = _hits(toks, ENGLISH_STOPWORDS)
    quality = _quality_expr(n_tokens, n_chars, n_punct, stop_hits)
    g = gopher_gates(docs, text_col, id_col, **(gopher_kwargs or {}))
    base = docs.select(
        id_col,
        group_col,
        n_tokens.alias("_nt"),
        quality.cast("int").alias("_q"),
        F.md5(F.col(text_col)).alias("_fp"),
    ).join(g.select(id_col, "gopher_ok"), id_col)
    return (
        base.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.expr("(sum(_q) * 100) div count(1)").cast("long").alias(
                "mean_quality_centi"
            ),
            F.sum(F.col("gopher_ok").cast("int")).cast("long").alias(
                "n_gopher_pass"
            ),
            (F.count(F.lit(1)) - F.count_distinct(F.col("_fp")))
            .cast("long")
            .alias("n_exact_dup_surplus"),
        )
        .select(
            group_col, "n_docs", "n_tokens", "mean_quality_centi",
            "n_gopher_pass", "n_exact_dup_surplus",
        )
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of whitespace-normalized lowercase
    text, its 60-bit integer prefix (bucketable), and a Rabin-Karp
    polynomial rolling hash of the normalized text.

    The rolling hash folds per character; Catalyst's higher-order
    ``aggregate`` runs interpreted (~10 µs/char), so for document-length
    text the fold runs as an Arrow-batched ``mapInPandas`` stage
    instead (~40× faster, identical value — ``functions.text``)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.text import ROLL_BASE, ROLL_MOD

    base = docs.select(
        "doc_id",
        fingerprint(F.col(text_col)).alias("fp"),
        md5_long(normalized(F.col(text_col))).alias("fp_long"),
        normalized(F.col(text_col)).alias("_norm"),
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def h(s: str) -> int:
            acc = 0
            for c in s:
                acc = (acc * ROLL_BASE + ord(c)) % ROLL_MOD
            return acc

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fp": pdf["fp"],
                    "fp_long": pdf["fp_long"],
                    "roll_hash": [h(s) for s in pdf["_norm"]],
                }
            )

    return base.mapInPandas(
        fold, schema="doc_id long, fp string, fp_long long, roll_hash long"
    )


def unicode_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode-normalized content fingerprints: md5 (and its 60-bit
    integer prefix) of the NFKC + accent-strip + lowercase +
    whitespace-collapsed text (``functions.text.unicode_normalize_py``
    — the CCNet/MassiveText normalization). This is the gate that
    makes exact dedup robust to encoding variants: composed (NFC) and
    decomposed (NFD) renderings of the same string, full-width forms,
    and ligatures all collapse to one fingerprint, where the plain
    ``fingerprints`` (whitespace+lowercase only) keeps them distinct.

    Scale shape: ONE Arrow ``mapInPandas`` pass does the normalization
    (stdlib ``unicodedata``, no per-row Python UDF); the md5 hashing
    stays JVM-side in whole-stage codegen over the returned normalized
    column."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.text import unicode_normalize_py

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_unorm": [
                        unicode_normalize_py(s) for s in pdf[text_col]
                    ],
                }
            )

    normed = docs.select(id_col, text_col).mapInPandas(
        norm, schema=f"{id_col} long, _unorm string"
    )
    return normed.select(
        id_col,
        F.md5("_unorm").alias("ufp"),
        md5_long(F.col("_unorm")).alias("ufp_long"),
    )


def with_unicode_normalized_text(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Rewrite ``text_col`` in place to its unicode-normalized form
    (``functions.text.unicode_normalize_py``: NFKC + accent strip +
    lowercase + collapse) in ONE Arrow pass over the existing schema —
    the composable front gate that makes every downstream fingerprint,
    dedup signature, and signal see canonical text. Same position in
    the funnel as PII redaction: transform FIRST, so nothing ever
    hashes or stores the un-normalized variant."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.text import unicode_normalize_py

    schema = docs.schema

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[text_col] = [unicode_normalize_py(s) for s in pdf[text_col]]
            yield pdf

    return docs.mapInPandas(norm, schema=schema)


def unicode_exact_keepers(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keeper assignment under unicode-normalized exact
    dedup: every doc maps to the min id sharing its normalized
    fingerprint (itself when unique) — the normalized twin of the
    exact-dedup keeper relation, so NFC/NFD/full-width/ligature
    variants of one text collapse to one keeper."""
    fps = unicode_fingerprints(docs, text_col, id_col)
    keep = fps.groupBy("ufp").agg(F.min(id_col).alias("keeper_doc_id"))
    return fps.join(keep, "ufp").select(
        id_col, "ufp", "ufp_long", "keeper_doc_id"
    )


def bottomk_sketch(
    docs: DataFrame,
    n: int = 5,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing-style document sketch: rolling-hash every character
    n-gram, keep each document's k smallest hashes — a fixed-size
    locality-sensitive fingerprint set (bottom-k of a permutation ≈
    MinHash over one hash function; two docs' sketches overlap in
    proportion to their n-gram Jaccard). Rows: (doc_id, rank, kgram_hash).

    Physical plan: ONE Arrow ``mapInPandas`` pass, no shuffle at all.
    The sketch is a pure per-document function, so instead of
    exploding ~len(text) shingle rows and aggregating them back
    (a corpus-sized exchange), each batch computes every n-gram's
    Rabin-Karp hash as a vectorized sliding-window dot product mod M
    (codepoints via utf-32 decode — identical fold values to
    ``functions.text.rolling_hash``) and emits the k smallest distinct
    hashes directly. At 100 TB this is embarrassingly parallel and
    shuffle-free; the JVM expression formulation remains available as
    ``rolling_hash_fixed`` for shingle-level callers."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.text import ROLL_BASE, ROLL_MOD

    # B^{n-1-j} mod M for the window dot product; each term is
    # < 2^21 (max codepoint) * 2^30 (M) and the n-term sum stays far
    # below 2^63 — exact int64, same residues as the sequential fold.
    pows = [pow(ROLL_BASE, n - 1 - j, ROLL_MOD) for j in range(n)]

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        pvec = np.asarray(pows, dtype=np.int64)
        for pdf in batches:
            ids: list = []
            ranks: list = []
            hashes: list = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                if s is None or len(s) < n:
                    continue
                c = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                win = np.lib.stride_tricks.sliding_window_view(c, n)
                bk = np.unique((win @ pvec) % ROLL_MOD)[:k]
                ids.extend([did] * len(bk))
                ranks.extend(range(1, len(bk) + 1))
                hashes.extend(bk)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "rank": pd.Series(ranks, dtype="int32"),
                    "kgram_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        sketch, f"{id_col} long, rank int, kgram_hash long"
    )


# Integer idf scale: idf_scaled = ((N - df + 1) * IDF_SCALE) div (df + 1),
# the add-one-smoothed rational idf (N-df+1)/(df+1) at 6 decimal digits.
# Chosen over log-idf because it is EXACT in 64-bit integer math on both
# engines (Spark `div` truncates, DuckDB `//` floors — identical on the
# non-negative operands here), where ln/log10 round differently in the
# last ulp and eventually flip a rank. Same monotone-decreasing-in-df
# shape as log idf; scores are comparable within a corpus, not across.
IDF_SCALE = 1_000_000


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf, integer-exact.

    Plan: one explode to (doc, term) tokens; tf = count per (doc,
    term); df = count of docs per term derived FROM tf (no second
    pass over raw tokens); N = corpus doc count joined in as a
    1-row broadcast. All aggregates are map-side combinable; the
    only windows partition by doc. Rows: (doc_id, term_rank, term,
    tf, score) with score = tf · idf_scaled, ties broken by term
    ASC so top-k is total-ordered.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * F.expr(
                f"((n_docs - df + 1) * {IDF_SCALE}L) div (df + 1)"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "term", "tf", "score")
    )


def curation_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All curation signals for the funnel in ONE projection over one
    scan: language agreement (predicted == recorded), the quality
    score, and the exact-text fingerprint (same md5 the exact-dedup
    operator groups on). No joins — each signal is a column
    expression, so a funnel over 100 TB is one pass."""
    from ..functions.text import script_residue

    m = _stopword_mask_map()
    staged = docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
        script_residue(F.col(text_col)).alias("__scripts"),
        F.length(text_col).cast("int").alias("n_chars"),
        punct_count(F.col(text_col)).cast("int").alias("n_punct"),
        F.md5(F.col(text_col)).alias("text_fp"),
    )
    masked = staged.select(
        "doc_id",
        "lang_true",
        "__scripts",
        "__toks",
        F.transform(
            F.col("__toks"),
            lambda t: F.coalesce(m[t], F.lit(0).cast("long")),
        ).alias("__masks"),
        "n_chars",
        "n_punct",
        "text_fp",
    )
    # the hits array must be ITS OWN projection step: the scores
    # array references it 13 times, and an inlined aggregate would
    # re-run once per reference
    arred = masked.select(
        "doc_id",
        "lang_true",
        "__scripts",
        "__toks",
        _lang_hits_array(F.col("__masks")).alias("__hits"),
        "n_chars",
        "n_punct",
        "text_fp",
    )
    counted = arred.select(
        "doc_id",
        "lang_true",
        _lang_scores_array(
            F.col("__hits"), F.col("__scripts")
        ).alias("__scores"),
        F.size("__toks").alias("n_tokens"),
        "n_chars",
        "n_punct",
        _hits(F.col("__toks"), ENGLISH_STOPWORDS).alias("stop_hits"),
        "text_fp",
    )
    score = _quality_expr(
        F.col("n_tokens"), F.col("n_chars"), F.col("n_punct"),
        F.col("stop_hits"),
    )
    return counted.select(
        "doc_id",
        (_argmax_lang(F.col("__scores")) == F.col("lang_true")).alias(
            "lang_ok"
        ),
        score.cast("int").alias("quality_score"),
        "text_fp",
    )


VOCAB_SIZE = 100


def unigram_coverage(
    docs: DataFrame,
    vocab_size: int = VOCAB_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document in-vocabulary coverage against the corpus's own
    top-``vocab_size`` unigram vocabulary — the OOV-rate signal an LM
    data pipeline uses to spot noise/code/other-language contamination.

    Plan: ONE token explode feeds both sides — the global term counts
    (map-side-combinable aggregate; top-V via TakeOrderedAndProject,
    V rows survive) and the per-doc counter, which left-joins the
    BROADCAST vocabulary and counts hits and tokens in one aggregate.
    Token-less documents re-enter via a left join from the corpus
    (coverage 0). Vocabulary ties break on (count DESC, term ASC) so
    the boundary is total-ordered. Rows: (doc_id, n_tokens, n_invocab,
    coverage)."""
    toks = docs.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .orderBy(F.desc("_tf"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("_inv"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("_inv").alias("n_invocab"),
        )
    )
    n_tok = F.coalesce("n_tokens", F.lit(0)).alias("n_tokens")
    n_inv = F.coalesce("n_invocab", F.lit(0)).alias("n_invocab")
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        n_tok,
        n_inv,
        (
            F.coalesce("n_invocab", F.lit(0))
            / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1))
        ).alias("coverage"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition signals, the Gopher/MassiveText-style
    quality gates a pretraining curation pipeline cuts on: duplicate
    token fraction, most-common-token share, most-common-bigram share,
    and the fraction of trigram occurrences that are repeats. (The
    reference has no notion of document quality — this extends the
    brief's curation family; rule shapes follow the published
    MassiveText filters.)

    Physical plan: ONE shuffle-free Arrow ``mapInPandas`` pass — every
    signal is a pure per-document function of the whitespace token
    sequence, so there is no explode and no corpus-wide exchange (the
    narrow repartition only widens local inputs with fewer splits than
    cores). Determinism: all four ratios are divisions of exact
    integer counts — identical doubles on every engine.

    Columns: (doc_id, n_tokens, n_distinct, dup_token_frac,
    top_token_frac, top_bigram_frac, dup_trigram_frac); zero-token
    documents report 0.0 everywhere, n-gram ratios with fewer than n
    tokens likewise.
    """
    import re
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    ws = re.compile(r"\s+")
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_tokens long, n_distinct long, "
        "dup_token_frac double, top_token_frac double, "
        "top_bigram_frac double, dup_trigram_frac double"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                stripped = (s or "").strip()
                toks = ws.split(stripped.lower()) if stripped else []
                n = len(toks)
                if n == 0:
                    rows.append((did, 0, 0, 0.0, 0.0, 0.0, 0.0))
                    continue
                tc = Counter(toks)
                d = len(tc)
                bi = Counter(
                    " ".join(toks[i : i + 2]) for i in range(n - 1)
                )
                tri = Counter(
                    " ".join(toks[i : i + 3]) for i in range(n - 2)
                )
                n_bi, n_tri = n - 1, n - 2
                rows.append(
                    (
                        did,
                        n,
                        d,
                        (n - d) / n,
                        max(tc.values()) / n,
                        max(bi.values()) / n_bi if n_bi > 0 else 0.0,
                        (
                            sum(c for c in tri.values() if c > 1) / n_tri
                            if n_tri > 0
                            else 0.0
                        ),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col,
                        "n_tokens",
                        "n_distinct",
                        "dup_token_frac",
                        "top_token_frac",
                        "top_bigram_frac",
                        "dup_trigram_frac",
                    ],
                )

    from .dedup import _shuffle_parts

    src = docs.select(id_col, text_col)
    parts = _shuffle_parts(docs)
    if src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts)
    return src.mapInPandas(stats, schema)


def interdoc_dup_stats(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inter-document duplicate-content signal (ExactSubstr-lite,
    the n-gram-granular form of Lee et al.'s exact-substring dedup):
    for every document, how much of it is text that ALSO occurs in
    other documents.

    Per doc: ``n_grams`` = distinct character ``n``-gram fingerprints,
    ``n_dup_grams`` = how many of those occur in ≥ 2 documents
    corpus-wide, and ``dup_permille`` = ⌊n_dup·1000/n_grams⌋ (integer,
    engine-exact; 0 for gram-less docs). Complements the INTRA-doc
    Gopher signals (``repetition_stats``): a doc can be internally
    clean yet be boilerplate shared across the crawl — this is the
    signal that catches it.

    Plan shape: per-doc distinct gram sets from the shuffle-free Arrow
    pass (``dedup.shingle_hash_sets``), one narrow explode, ONE
    map-side-combinable groupBy(gram) for document frequency, one
    equi-join back on the gram hash, one groupBy(doc). Never all-pairs
    — cost is O(corpus grams), the same shape as CCNet's corpus-level
    n-gram counting, and both shuffles key on the 60-bit gram hash
    (uniform by construction, no skew)."""
    from .dedup import shingle_hash_sets

    sets = shingle_hash_sets(docs, n, text_col, id_col)
    grams = sets.select(id_col, F.explode("_shset").alias("_g"))
    df_counts = grams.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_df")
    )
    per_doc = (
        grams.join(df_counts, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("_df") >= 2, 1)).alias("n_dup_grams"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            # DIV is exact bigint division on both engines (DuckDB //)
            # — no float rounding at permille boundaries.
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("(n_dup_grams * 1000) DIV n_grams")
            )
            .cast("long")
            .alias("dup_permille"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ws",
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    of a pretraining/RAG pipeline: overlapping windows of
    ``chunk_tokens`` tokens with stride ``chunk_tokens - overlap``
    (``token_mode="mixed"`` windows no-whitespace scripts by
    char-1-grams instead of treating a CJK doc as one token; the
    chunk_text re-join is single-space in both modes — declared
    tokenization normalization).

    Chunk count is the standard sliding-window formula
    (1 if n ≤ C else ⌈(n-C)/S⌉ + 1, integer ceil — no float math), so
    the final window always reaches the document's end and only the
    final window may be short. ``chunk_text`` is the single-space join
    of the window's tokens (tokenization-normalized, NOT a raw
    substring). Zero-token documents emit one empty chunk, keeping the
    operator total: every doc appears.

    Plan: pure per-row expressions + a narrow ~n/S-per-doc explode —
    no shuffle, no UDF; embarrassingly parallel at any corpus size.
    """
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    toks = tokens(F.col(text_col), token_mode)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (n - chunk_tokens + stride - 1).cast("long") / stride + 1
    ).cast("int")
    out = docs.select(
        id_col,
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    window = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).alias("n_chunk_tokens"),
    )


def compression_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """DEFLATE compression ratio per document — the classic
    "compresses too well = machine-generated/boilerplate, doesn't
    compress at all = random noise" curation signal (used alongside
    the Gopher repetition cuts in production crawl pipelines).

    Per doc: ``n_bytes`` (utf-8 length), ``n_compressed``
    (``zlib.compress`` at the fixed ``level``), and
    ``compression_permille`` = ⌊n_compressed·1000/n_bytes⌋ (integer;
    0 for empty text). One shuffle-free Arrow ``mapInPandas`` pass —
    same plan shape as ``repetition_stats``; zlib is stdlib, no
    optional dependency.

    NOTE: this is the one operator family with NO DuckDB oracle — SQL
    has no DEFLATE — so its driver row is rows-only checked; value
    determinism (fixed level → identical bytes within a container) is
    pinned by unit tests instead.
    """
    from collections.abc import Iterator

    import pandas as pd

    from .dedup import _shuffle_parts

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_bytes long, n_compressed long, "
        "compression_permille long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            ids, nb, nc, pm = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level) if raw else b""
                ids.append(did)
                nb.append(len(raw))
                nc.append(len(comp))
                pm.append(len(comp) * 1000 // len(raw) if raw else 0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_permille": pm,
                }
            )

    src = docs.select(id_col, text_col)
    parts = _shuffle_parts(docs)
    if src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts)
    return src.mapInPandas(stats, schema)


# Scaled inverse-probability: invp = ((c1 + V) * LM_SCALE) div (c2 + 1),
# the add-one-smoothed bigram 1/p̂ at 6 decimal digits. Chosen over
# log-space perplexity for the same two reasons tf-idf uses rational
# idf: (a) ln rounds differently in the last ulp across engines, and
# (b) a double SUM is partition-order-dependent in Spark while integer
# sums are associative — so the pinned score stays hash-exact. The
# arithmetic mean of 1/p̂ is monotone in "branching surprise" exactly
# like perplexity's geometric mean: common continuations score near
# LM_SCALE·V/c-ish small values, rare ones score large.
LM_SCALE = 1_000_000

# Row bound under which a min_count-pruned LM model relation is
# broadcast into the score join (~50 B/gram row → ~50 MB at the
# bound). The floor exists to shrink the model 36-426×; paying a
# full shuffle join against a relation that small inverts the point.
LM_BROADCAST_MODEL_ROWS = 1_000_000


def _gram_array_from(toks: Column, n: int = 2):
    """array<struct<ctx,w>> of order-``n`` grams over an
    ALREADY-PROJECTED token-array COLUMN: ``ctx`` = the n-1 context
    words space-joined, ``w`` = the continuation. Empty for <n-token
    text (sequence DESCENDS when the stop is below the start). For
    n=2 this is exactly the adjacent pair (ctx=w1, w=w2).

    The column requirement is a measured hot-path constraint, not
    style: higher-order-function lambdas evaluate INLINED expression
    arguments per element (no codegen subexpression elimination
    inside the lambda), so passing the raw tokenize EXPRESSION here
    re-ran regexp+split once per gram reference — O(tokens²) work per
    document. Tokenizing into a column first (``_toked``) runs it
    once per row: measured 12.5 → 6.6 s on the sf0.1 bigram-LM row
    and 22.8 → 8.9 s on the mixed-mode per-language row."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                F.concat_ws(
                    " ",
                    *[F.element_at(toks, i + F.lit(j)) for j in range(n - 1)],
                ).alias("ctx"),
                F.element_at(toks, i + F.lit(n - 1)).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ctx:string,w:string>>"))


def _toked(
    docs: DataFrame,
    cols: list,
    text_col: str,
    token_mode: str,
) -> DataFrame:
    """Project ``cols`` plus the lowercase token array as ``_tk`` —
    the one-tokenize-per-row prerequisite of ``_gram_array_from``."""
    return docs.select(
        *cols,
        tokens(F.lower(F.col(text_col)), token_mode).alias("_tk"),
    )


def bigram_lm_counts(
    lm_docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 1,
    lang_col: str | None = None,
    token_mode: str = "ws",
) -> DataFrame:
    """The trained n-gram model as its count relation: (ctx, w, c2) —
    plus a leading ``lang_col`` key when ``lang_col`` is given (one model
    per language, CCNet's actual configuration). This is the ONE
    artifact a long-lived scorer (e.g. the streaming fluency gate)
    materializes once and reuses — pass it to
    ``lm_surprisal_stats(lm_counts=...)`` so each micro-batch scores
    against the same static model without re-counting.

    ``min_count`` is the production count floor for n≥3 models: grams
    rarer than the floor are dropped from the relation (they score the
    Laplace floor downstream, exactly like OOV grams), which bounds
    the model at the grams that repeat — the long tail of one-off
    n-grams, the part that grows ~O(corpus tokens), never
    materializes past the (map-side combinable) count aggregate."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    mk = [F.col(lang_col)] if lang_col else []
    toked = _toked(lm_docs, mk, text_col, token_mode)
    keys = ([F.col(lang_col)] if lang_col else []) + [
        F.col("g.ctx").alias("ctx"),
        F.col("g.w").alias("w"),
    ]
    cols = ([F.col(lang_col)] if lang_col else []) + [
        F.explode(_gram_array_from(F.col("_tk"), n)).alias("g")
    ]
    counts = (
        toked.select(*cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("c2") >= min_count)
    return counts


def lm_surprisal_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_docs: DataFrame | None = None,
    lm_filter: Column | None = None,
    n: int = 2,
    lm_counts: DataFrame | None = None,
    min_count: int = 1,
    lang_col: str | None = None,
    model_rows: int | None = None,
    token_mode: str = "ws",
) -> DataFrame:
    """CCNet-style n-gram LM quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets"), the
    perplexity-bucket filter every web-scale corpus pipeline runs:
    train a smoothed bigram LM, score each document by how surprising
    its token transitions are, cut or bucket on the score
    (``classify.quantile_prune`` composes downstream for the
    head/middle/tail split).

    ``lm_docs=None`` trains on the scored corpus itself
    (self-perplexity, the fluency-outlier detector); passing a
    reference corpus is CCNet's actual configuration (their LM is
    Wikipedia-trained) — every doc is scored against THAT model, and
    transitions outside it are maximally surprising
    (``invp = V·LM_SCALE``: the Laplace floor, c2 = c1 = 0).
    ``lm_filter`` is the fast path when the reference split is CARVED
    FROM ``docs`` (a predicate on ``id_col``, e.g. the md5 split):
    the model counts then derive from the already-computed per-doc
    gram relation — one tokenize pass total instead of two.

    Integer-exact per the module doctrine: see ``LM_SCALE``.

    Plan shape (the 100 TB story): one explode to (doc, ctx, w) with
    an immediate per-doc gram combine (map-side combinable groupBy);
    global gram counts derive FROM that relation — no second pass
    over raw tokens; context counts and vocab derive from the gram
    counts. At n=2 the count relation is vocab²-bounded (≪ corpus,
    broadcasts under the threshold); at n≥3 it grows with distinct
    n-grams — on natural text ~O(corpus tokens) in the worst case —
    so the score join becomes a key-partitioned shuffle join there
    (still never all-pairs; hot grams are skew-bounded by AQE's
    skew-join split; a production 5-gram LM would prune rare grams
    to a count floor first, which composes as one extra filter on
    the count relation). Final per-doc aggregate is map-side
    combinable. No windows, no all-pairs, nothing driver-side.

    ``min_count`` prunes the model to grams seen at least that often —
    the production mitigation for the n≥3 count relation (which grows
    ~O(corpus tokens) on natural text at min_count=1): everything
    downstream (context counts, vocab, the score join) derives from
    the PRUNED relation, so pruned grams score exactly like OOV grams
    (the Laplace floor) and the model relation is bounded by the grams
    that repeat. Any ``min_count > 1`` therefore makes the score join
    a left join even when self-trained. With ``min_count > 1`` the
    broadcast-vs-shuffle decision for the score joins costs one eager
    count of the pruned model at plan-build time; pass ``model_rows``
    (an upper bound the caller already knows) to keep construction
    fully lazy and decide from the bound instead.

    ``lang_col`` keys the WHOLE model by language — one independent LM
    per language, CCNet's actual configuration (Wenzek 2020 trains one
    KenLM per language; a shared model mis-scores a multilingual
    corpus because cross-language transitions look maximally
    surprising). Every relation (counts, contexts, vocab) carries the
    language key and each document is scored only against its own
    language's model; the output gains the ``lang_col`` column. A
    language whose model is empty (all docs under n tokens, or fully
    pruned) has V=0 and scores 0 — degenerate by construction,
    documented rather than special-cased. With ``lm_counts`` the
    passed relation must carry the same ``lang_col`` key.

    Returns one row per input document: (id[, lang], n_bigrams,
    mean_invp_scaled, max_invp_scaled) — NULL stats for docs with
    fewer than n tokens (no transitions to score).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    mk = [lang_col] if lang_col else []
    # dg feeds multiple consumers (the score join, plus the model
    # relations when self-trained); checkpoint so the tokenize+explode
    # corpus pass runs once, not 4×. Tokenize into a COLUMN first —
    # see _gram_array_from's hot-path note.
    toked = _toked(
        docs, [F.col(id_col), *[F.col(c) for c in mk]], text_col,
        token_mode,
    )
    dg = (
        toked.select(
            F.col(id_col), *[F.col(c) for c in mk],
            F.explode(_gram_array_from(F.col("_tk"), n)).alias("g"),
        )
        .select(id_col, *mk, F.col("g.ctx").alias("ctx"),
                F.col("g.w").alias("w"))
        .groupBy(id_col, *mk, "ctx", "w")
        .agg(F.count(F.lit(1)).alias("dcnt"))
        .localCheckpoint(eager=False)
    )
    given = [x is not None for x in (lm_docs, lm_filter, lm_counts)]
    if sum(given) > 1:
        raise ValueError(
            "pass at most one of lm_docs / lm_filter / lm_counts"
        )
    if lm_counts is not None:
        c2 = lm_counts
        how = "left"  # held-out: OOV grams score the Laplace floor
    elif lm_docs is None and lm_filter is None:
        c2 = dg.groupBy(*mk, "ctx", "w").agg(F.sum("dcnt").alias("c2"))
        how = "inner"  # self-trained: every scored gram is in the model
    elif lm_filter is not None:
        c2 = (
            dg.filter(lm_filter)
            .groupBy(*mk, "ctx", "w")
            .agg(F.sum("dcnt").alias("c2"))
        )
        how = "left"  # held-out: OOV grams score the Laplace floor
    else:
        # feeds c1, vocab, the join — checkpoint once
        c2 = bigram_lm_counts(
            lm_docs, text_col, n, lang_col=lang_col,
            token_mode=token_mode,
        ).localCheckpoint(eager=False)
        how = "left"  # held-out: OOV grams score the Laplace floor
    broadcast_model = False
    if min_count > 1:
        # the production floor: one filter on the count relation;
        # pruned grams become indistinguishable from OOV, so the
        # score join must tolerate misses even when self-trained
        c2 = c2.filter(F.col("c2") >= min_count).localCheckpoint(
            eager=False
        )
        how = "left"
        # A floored model is bounded by the grams that REPEAT
        # (≤ corpus_tokens/min_count rows, measured 36-426× cuts at
        # min_count 2-5) — when it fits the broadcast budget the
        # score join should be a broadcast hash join, not a shuffle
        # of the full per-doc gram relation. ``model_rows`` (a
        # caller-known bound, the similarity.py n_vectors escape
        # hatch) keeps construction fully lazy; otherwise one
        # metadata-bounded count decides (the checkpoint pins the
        # pruned relation so the decision pass is not recomputed by
        # the join) — cost-based like the fused/iterative component
        # walk, at the declared price of one eager job at plan-build.
        if model_rows is not None:
            broadcast_model = model_rows <= LM_BROADCAST_MODEL_ROWS
        else:
            broadcast_model = c2.count() <= LM_BROADCAST_MODEL_ROWS
    c1 = c2.groupBy(*mk, "ctx").agg(F.sum("c2").alias("c1"))
    if broadcast_model:
        c2 = F.broadcast(c2)
        c1 = F.broadcast(c1)
    # V = distinct tokens participating in any model gram (derived
    # from the count relation by re-splitting the joined context — a
    # vocab²-bounded pass, never a second raw-token scan; <n-token
    # docs have nothing to score so their tokens are out of model by
    # definition). For n=2 this is exactly distinct(w1 ∪ w2). Per
    # language when lang_col is set (each model has its own V).
    vocab = (
        c2.select(
            *mk,
            F.explode(
                F.concat(F.split(F.col("ctx"), " "), F.array(F.col("w")))
            ).alias("tok"),
        )
        .groupBy(*mk)
        .agg(F.count_distinct("tok").alias("v"))
    )
    joined = dg.join(c2, mk + ["ctx", "w"], how).join(
        c1, mk + ["ctx"], how
    )
    if lang_col:
        # #languages-bounded relation — broadcast, left so an
        # empty-model language degenerates to V=0 instead of dropping
        joined = joined.join(F.broadcast(vocab), mk, "left")
    else:
        joined = joined.crossJoin(F.broadcast(vocab))
    scored = joined.withColumn(
        "invp",
        F.expr(
            f"((coalesce(c1, 0L) + coalesce(v, 0L)) * {LM_SCALE}L) "
            "div (coalesce(c2, 0L) + 1)"
        ),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("dcnt").alias("n_bigrams"),
        F.expr("sum(dcnt * invp) div sum(dcnt)").alias("mean_invp_scaled"),
        F.max("invp").alias("max_invp_scaled"),
    )
    return docs.select(id_col, *mk).join(per_doc, id_col, "left").select(
        id_col,
        *mk,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "mean_invp_scaled",
        "max_invp_scaled",
    )


# --- Feature-hashed text embeddings (hashing trick) -------------------
# Weinberger et al. 2009 ("Feature Hashing for Large Scale Multitask
# Learning"): bucket every token by hash, flip its contribution's sign
# by an independent hash bit, sum.  Inner products of the sketches are
# unbiased estimates of bag-of-words inner products, so the
# embedding-space operators (cosine near-dup, kNN graph, k-means,
# SemDeDup, ANN) can run on corpora that have NO model-produced
# embedding column — text in, vectors out, no external model, fully
# deterministic.  This is the signed-sum core SimHash shares; unlike
# SimHash the components stay integer counts instead of collapsing to
# sign bits, so cosine between sketches approximates cosine between
# bag-of-words vectors rather than angular agreement of fingerprints.
HASH_EMBED_DIM = 64


def hashed_embedding_components(
    docs: DataFrame,
    dim: int = HASH_EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse feature-hashed embedding: (id, bucket, val) signed
    occurrence counts, exactly-cancelled (val = 0) buckets dropped.

    bucket = md5_long('e|' + tok) % dim, sign = ± by an independent
    md5 bit — both mirrored verbatim in the DuckDB oracle, so the
    relation is hash-exact (components are integers; no floats).

    Plan shape: one explode + one map-side-combinable groupBy on
    (id, bucket) — a single bounded shuffle, rows ≤ docs × dim.
    Tokenless documents contribute no rows; the dense variant
    re-attaches them as zero vectors."""
    toks = tokens(F.lower(F.col(text_col)))
    sign = F.when(
        md5_long(F.concat(F.lit("s|"), F.col("tok"))) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .select(
            id_col,
            (md5_long(F.concat(F.lit("e|"), F.col("tok"))) % dim)
            .cast("int")
            .alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("long").alias("val"))
        .where(F.col("val") != 0)
    )


def hashed_embedding_vectors(
    docs: DataFrame,
    dim: int = HASH_EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense form of ``hashed_embedding_components``: (vec_id,
    embedding: array<double>) — column names chosen to plug directly
    into every embedding operator in ``operators.similarity``.

    Components are INTEGER-VALUED doubles (signed counts, exactly
    representable).  Pass ``vec_scale=1`` to the similarity operators:
    their micro-unit rescale is then the identity and all downstream
    integer-exactness guarantees hold verbatim.  Tokenless documents
    become zero vectors (cosine against them is NaN and fails every
    threshold/top-k comparison on both engines).

    Densify is a per-doc map lookup — no window, no all-pairs. Plan
    shape: the components' (id, bucket) combine, an id-keyed combine
    into one map row per doc, and an id-equi join back onto the doc
    ids (re-attaching tokenless docs as zero vectors) — two bounded
    exchanges plus one join, every relation ≤ docs × dim rows. At
    sketch width dim the dense relation is docs × dim doubles; for
    100 TB corpora keep the sparse components relation instead and
    densify only inside the consuming operator's partition."""
    comp = hashed_embedding_components(docs, dim, text_col, id_col)
    m = comp.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "val"))
        ).alias("_m")
    )
    return (
        docs.select(F.col(id_col).alias("vec_id"))
        .join(m.withColumnRenamed(id_col, "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(int(dim) - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("int")), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )
