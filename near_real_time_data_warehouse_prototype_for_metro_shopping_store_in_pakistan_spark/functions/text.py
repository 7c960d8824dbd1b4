"""Text-analysis column functions for the training-data pipeline ops.

Beyond reference parity (the reference's only string ops are trim and
quote sanitization, src/Meshjoin.java:94,555-573), a 100 TB training
pipeline needs language ID, quality scoring, token counting and
fingerprinting over a ``documents`` table. Everything here is built-in
column expressions — no Python UDFs — so the hot path stays JVM-side
inside whole-stage codegen, and every function has an exact ANSI-SQL
equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"

# Tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic. Order matters: argmax ties break by this order
# — the original five languages stay first so their tie-breaks (and
# every row pinned on them) are unchanged by the r12 breadth extension.
# Non-Latin-script languages carry sparse lists on purpose: their
# decisive signal is the SCRIPT prior (LANG_SCRIPTS below); ja's list
# is single kana particles, which only match as char-1-grams under
# tokens(mode="mixed") — under "ws" the script prior alone drives.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "un", "est"],
    "es": ["el", "los", "y", "en", "un", "es"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4"],
    "ru": ["и", "в", "не", "на", "что", "это"],
    "ar": ["في", "من", "على", "أن", "إلى", "عن"],
    "hi": ["है", "के", "में", "की", "और", "से"],
    "pt": ["que", "não", "uma", "por", "com", "para"],
    "it": ["che", "di", "il", "per", "non", "sono"],
    "ja": ["の", "に", "は", "を", "が", "た"],
    "ko": ["그리고", "하지만", "있다", "것은", "수", "들"],
    "th": ["ที่", "และ", "ใน", "ของ", "ได้", "ว่า"],
}
LANG_ORDER = list(LANG_STOPWORDS)

# Script priors for languages whose writing system identifies them
# better than any small stopword list can: characters in these ranges
# count toward the language's ID score (below stopword weight — see
# LANG_SCORE_SCALE). Latin-script languages deliberately have none (a
# shared script identifies nothing). ja includes the CJK ideograph
# ranges ALONGSIDE kana, so Japanese text (always kana-bearing)
# outscores zh, while pure-ideograph text ties and the tie breaks to
# zh (earlier in LANG_ORDER) — the standard kana-decides-Japanese
# heuristic in deterministic form.
LANG_SCRIPTS: dict[str, str] = {
    "zh": "㐀-䶿一-鿿豈-﫿",
    "ja": "぀-ゟ゠-ヿ㐀-䶿一-鿿",
    "ko": "ᄀ-ᇿ㄰-㆏가-힯",
    "ru": "Ѐ-ӿ",
    "ar": "؀-ۿݐ-ݿ",
    "hi": "ऀ-ॿ",
    "th": "฀-๿",
}

# Language-ID score = stopword_hits * LANG_SCORE_SCALE +
# min(script_char_count, LANG_SCORE_SCALE - 1): one stopword hit
# outranks any amount of script evidence (stopwords are the exact
# signal; script is the prior), and the capped script term keeps the
# sum inside BIGINT on both engines for any document length.
LANG_SCORE_SCALE = 1_000_000


def script_hits(text: Column, ranges: str) -> Column:
    """Count of characters of ``text`` inside the given script
    ranges — one JVM-side regexp_replace + two lengths, the same
    expression the DuckDB oracle mirrors."""
    return (
        F.length(text)
        - F.length(F.regexp_replace(text, f"[{ranges}]", ""))
    ).cast("long")


# Union of every LANG_SCRIPTS range (duplicates are harmless inside a
# regex character class): one negated-class pass strips everything
# OUTSIDE all script-prior ranges, and the per-language counts then
# run over that residue instead of the full document. On Latin-script
# corpora the residue is ~empty, so the 7 per-language passes cost
# ~nothing — cutting the langid matrix from 7 full-text regex passes
# per doc to 1 (the r12 langid cost regression). Counts are IDENTICAL
# by construction: the residue retains exactly the characters any
# per-language class can match.
SCRIPT_UNION_RANGES = "".join(LANG_SCRIPTS.values())


def script_residue(text: Column) -> Column:
    """``text`` with every character outside ALL script-prior ranges
    removed — the shared single-pass input for per-language
    ``script_hits``. Project it to a column once per row (the same
    one-pass-per-row discipline as ``text_profile._toked``)."""
    return F.regexp_replace(text, f"[^{SCRIPT_UNION_RANGES}]", "")

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"] + ["that", "it", "for", "on", "with", "as"]


def normalized(text: Column) -> Column:
    """Lowercase + collapse internal whitespace + trim."""
    return F.regexp_replace(F.lower(F.trim(text)), WHITESPACE_RE, " ")


# Scripts written WITHOUT inter-word whitespace: CJK ideographs (+ Ext
# A, compatibility), kana, CJK symbols/punctuation (incl. U+3000
# ideographic space, which Java/RE2 \s does NOT match), Thai, Lao,
# Tibetan, Myanmar, Khmer. Korean Hangul is deliberately absent —
# Korean uses spaces between words, so whitespace tokenization is
# already sane there. A character in these ranges is tokenized as its
# own 1-gram under token_mode="mixed"; everything else still splits on
# whitespace — so an English doc tokenizes identically in both modes,
# while a CJK/Thai doc stops collapsing into ~1 giant token (which
# silently defeats every token-denominated gate: Gopher ratios, LM
# perplexity normalization, chunking, packing budgets).
NO_SPACE_SCRIPT_RANGES = (
    "\u3000-\u303f"  # CJK symbols & punctuation (incl. U+3000)
    "\u3040-\u309f"  # hiragana
    "\u30a0-\u30ff"  # katakana
    "\u3400-\u4dbf"  # CJK ext A
    "\u4e00-\u9fff"  # CJK unified ideographs
    "\uf900-\ufaff"  # CJK compatibility ideographs
    "\u0e00-\u0e7f"  # Thai
    "\u0e80-\u0eff"  # Lao
    "\u0f00-\u0fff"  # Tibetan
    "\u1000-\u109f"  # Myanmar
    "\u1780-\u17ff"  # Khmer
)

TOKEN_MODES = ("ws", "mixed", "runs")


def space_no_space_scripts(text: Column, runs: bool = False) -> Column:
    """Surround no-whitespace-script characters (``runs=False``) or
    maximal runs of them (``runs=True``) with spaces, so a downstream
    whitespace split yields char-1-gram tokens — or intact run tokens
    — for those scripts and unchanged word tokens elsewhere. One
    JVM-side regexp_replace — no Python, no explode; the DuckDB twin
    is the same replace with RE2 ``\\1`` syntax (see
    plans.pipeline_queries._sql_tokens_mixed)."""
    quant = "+" if runs else ""
    return F.regexp_replace(
        text, f"([{NO_SPACE_SCRIPT_RANGES}]{quant})", " $1 "
    )


def tokens(text: Column, mode: str = "ws") -> Column:
    """Tokenization; empty/blank text -> empty array.

    ``mode="ws"`` (default): whitespace split — correct for
    space-delimited scripts, and what every oracle-pinned r1-r10 row
    uses. ``mode="mixed"``: whitespace split AFTER isolating
    no-whitespace-script characters as their own char-1-gram tokens
    — identical to "ws" on ASCII/Latin text, sane token counts on
    CJK/Thai/Lao/Khmer/Myanmar/Tibetan text (the right denomination
    for counting/gating/chunking). ``mode="runs"``: isolate maximal
    no-whitespace-script RUNS as single tokens instead — the right
    PRE-tokenization for BPE (merges happen within a word, so a CJK
    run must stay one word for its chars to merge; char-1-grams could
    never). Token-denominated operators (language_id, gopher_gates,
    quality_scores, chunk_documents, BPE word_counts) take a
    ``token_mode`` parameter and forward it here."""
    if mode not in TOKEN_MODES:
        raise ValueError(
            f"unknown token mode {mode!r}: expected one of {TOKEN_MODES}"
        )
    if mode != "ws":
        text = space_no_space_scripts(text, runs=(mode == "runs"))
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WHITESPACE_RE)
    )


def token_count(text: Column, mode: str = "ws") -> Column:
    return F.size(tokens(text, mode))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: count of alphanumeric runs + punctuation marks.

    Matches the oracle's regex exactly; a real tokenizer would be a
    Pandas UDF, but a regex count is a good scale-cheap estimator.
    """
    arr = F.regexp_extract_all(text, F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(arr)


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Number of tokens of ``text`` that are in ``words`` (exact match,
    lowercase)."""
    toks = tokens(F.lower(text))
    w = F.array(*[F.lit(x) for x in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(w, t)))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def unicode_normalize_py(s: str) -> str:
    """CCNet/MassiveText-style Unicode normalization (pure Python, for
    the Arrow ``mapInPandas`` pass in ``operators.text_profile``):
    NFKC compatibility fold (full-width forms, ligatures,
    compatibility digits), accent strip (NFD decompose, drop combining
    marks), lowercase, whitespace collapse + trim. Without it,
    visually-identical NFC/NFD variants of the same text fingerprint
    as distinct and slip through every hash-keyed dedup stage.

    On ASCII input this reduces exactly to ``normalized()``'s
    lower+collapse (the DuckDB oracle row pins that equivalence over
    the testdata corpus); the non-ASCII semantics are pinned by unit
    tests with composed/decomposed twins."""
    import unicodedata

    s = unicodedata.normalize("NFKC", s)
    s = "".join(
        c
        for c in unicodedata.normalize("NFD", s)
        if not unicodedata.combining(c)
    )
    return " ".join(s.lower().split())


ROLL_BASE = 257
ROLL_MOD = 1_000_000_007  # both engines stay in BIGINT: acc*257+c < 2^39


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash (Rabin-Karp style) over character
    codepoints: h = Σ c_i·B^(n-i) mod P, folded left-to-right so each
    step is (acc·B + c) mod P — O(n), no big integers, exactly
    reproducible in DuckDB via list_reduce. Empty text hashes to 0.

    NOTE: higher-order functions (transform/aggregate) run INTERPRETED
    in Spark — ~10 µs/char. Use this for ad-hoc/short columns; for
    fixed-length n-grams use ``rolling_hash_fixed`` (unrolled, full
    codegen) and for long documents the Arrow-batched fold in
    ``operators.text_profile`` (~40× faster). All three produce the
    identical value."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(text.substr(i, F.lit(1))),
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD,
    )


def rolling_hash_fixed(text: Column, n: int) -> Column:
    """``rolling_hash`` for strings of known fixed length ``n``,
    unrolled into a flat codegen-able expression (no higher-order
    functions): same fold, same value."""
    acc: Column = F.lit(0).cast("long")
    for i in range(1, n + 1):
        acc = (acc * ROLL_BASE + F.ascii(text.substr(i, 1))) % ROLL_MOD
    return acc


def md5_long(s: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    Identical in the DuckDB oracle as
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`` — the shared
    deterministic hash under MinHash / SimHash / LSH operators.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
