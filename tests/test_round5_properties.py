"""Property tests for the round-5 operators: randomized corpora
checked against pure-Python brute force (the unit tests pin crafted
cases; these sweep the input space)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    classify,
    pii,
    text_profile,
)

# small alphabets force gram/token collisions, which is where the
# counting logic can break
WORDS = st.lists(
    st.sampled_from(["aa", "bb", "ab", "ba", "the", "x1"]), max_size=12
)
TEXTS = st.text(alphabet="ab @.x1-", max_size=30)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=12, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=6))
def test_classifier_matches_brute_force(spark, word_lists):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in classify.hashed_linear_score(docs).collect()
    }
    for i, ws in enumerate(word_lists):
        toks = " ".join(ws).lower().strip().split()
        s = 0
        for t in toks:
            b = _md5_60(t) % classify.N_BUCKETS
            s += (
                _md5_60(f"w|{b}") % classify.WEIGHT_SPAN
                - classify.WEIGHT_OFFSET
            )
        assert got[i] == (len(toks), s)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_interdoc_dup_matches_brute_force(spark, texts):
    n = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    gram_sets = {
        i: {
            _md5_60(t[j : j + n])
            for j in range(len(t) - n + 1)
        }
        if len(t) >= n
        else set()
        for i, t in enumerate(texts)
    }
    df_count: dict[int, int] = {}
    for s in gram_sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_permille"])
        for r in text_profile.interdoc_dup_stats(docs, n=n).collect()
    }
    assert set(got) == set(gram_sets)
    for i, s in gram_sets.items():
        dup = sum(1 for g in s if df_count[g] >= 2)
        pm = (dup * 1000) // len(s) if s else 0
        assert got[i] == (len(s), dup, pm)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab0123456789@.- ",
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pii_counts_match_python_re(spark, texts):
    # the patterns restrict to the Java-regex ∩ RE2 intersection,
    # which Python's re also implements with identical leftmost
    # non-overlapping semantics
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pii.pii_scan(docs).collect()}
    for i, t in enumerate(texts):
        for name, pat, _ in pii.PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, t)), (t, pat)
        red = t
        for _, pat, repl in pii.PII_PATTERNS:
            red = re.sub(pat, repl, red)
        assert got[i]["redacted"] == red
