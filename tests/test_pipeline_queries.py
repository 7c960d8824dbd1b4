"""Training-data pipeline queries (dedup / similarity / text / events)
vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans.pipeline_queries import (
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
)

from .oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


# the documented rows-only queries: no SQL equivalent exists (DuckDB
# has no DEFLATE), so the driver applies its weaker rows-only check
# and unit tests pin value determinism instead
ROWS_ONLY = {"text_compression"}


def test_keys_match():
    assert set(PIPELINE_QUERIES) - ROWS_ONLY == set(PIPELINE_ORACLES)
    assert not ROWS_ONLY & set(PIPELINE_ORACLES)


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_matches_oracle(spark, sf_dir, con, name):
    df = PIPELINE_QUERIES[name](spark, sf_dir)
    if name in ROWS_ONLY:
        assert df.count() > 0  # the driver's rows-only contract
        return
    compare(df, con, PIPELINE_ORACLES[name], name)


def test_curation_flags_agree_with_component_operators(spark, sf_dir):
    """curation_flags fuses langid + quality + exact-fp into one
    projection; it must never drift from the standalone operators."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
        table,
    )

    docs = table(spark, sf_dir, "documents")
    flags = {r.doc_id: r for r in text_profile.curation_flags(docs).collect()}
    lid = {r.doc_id: r for r in text_profile.language_id(docs).collect()}
    qual = {r.doc_id: r for r in text_profile.quality_scores(docs).collect()}
    assert flags and set(flags) == set(lid) == set(qual)
    for doc_id, r in flags.items():
        assert r.lang_ok == (lid[doc_id].lang_pred == lid[doc_id].lang_true)
        assert r.quality_score == qual[doc_id].quality_score


def test_curation_flags_fingerprint_identifies_exact_dups(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "the and of to in a is it for on", "en"),
            (2, "the and of to in a is it for on", "en"),  # exact dup
            (3, "completely different words here entirely", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    f = {r.doc_id: r for r in text_profile.curation_flags(docs).collect()}
    assert f[1].text_fp == f[2].text_fp != f[3].text_fp
    assert f[1].quality_score == f[2].quality_score


def test_repetition_stats_edges(spark):
    """Hand-computed repetition signals incl. empty/null/short docs."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, "x"),
            (3, ""),
            (4, None),
            (5, "A b a B"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_profile.repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    r = rows[1]
    assert (r.n_tokens, r.n_distinct) == (4, 1)
    assert r.dup_token_frac == 0.75 and r.top_token_frac == 1.0
    assert r.top_bigram_frac == 1.0 and r.dup_trigram_frac == 1.0
    r = rows[2]
    assert (r.n_tokens, r.n_distinct) == (1, 1)
    assert r.top_token_frac == 1.0
    assert r.top_bigram_frac == 0.0 and r.dup_trigram_frac == 0.0
    for d in (3, 4):
        r = rows[d]
        assert (r.n_tokens, r.n_distinct) == (0, 0)
        assert r.dup_token_frac == r.top_token_frac == 0.0
    r = rows[5]  # lowercased: a b a b
    assert (r.n_tokens, r.n_distinct) == (4, 2)
    assert r.dup_token_frac == 0.5 and r.top_token_frac == 0.5
    assert r.top_bigram_frac == 2 / 3  # "a b" twice of 3 bigrams
    assert r.dup_trigram_frac == 0.0  # "a b a", "b a b" unique


def test_kmeans_groups_obvious_blobs_and_keeps_empty_cells(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        similarity,
    )

    # two tight blobs around (1, 0) and (0, 1). md5 seeding picks ids
    # {6, 3, 2} for k=3 (deterministic: the 3 smallest md5(id||'|seed')
    # over ids 0-6). id 3 duplicates seed id 2 exactly, so cell 3
    # starts EMPTY (ties break to the lower centroid id) and must keep
    # its previous centroid without crashing the update round; seed 6
    # owns the second blob.
    rows = [
        (0, [0.9, 0.1]),
        (1, [0.1, 0.9]),
        (2, [1.0, 0.0]),
        (3, [1.0, 0.0]),
        (4, [1.1, -0.1]),
        (5, [-0.1, 1.1]),
        (6, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.cell
        for r in similarity.kmeans_cells(emb, k=3, iters=2).collect()
    }
    assert len(got) == 7
    assert got[0] == got[2] == got[3] == got[4] == 2
    assert got[1] == got[5] == got[6] == 6
    assert 3 not in set(got.values())  # the emptied cell wins nothing


def test_chunk_documents_covers_every_token(spark):
    """Property: stripping each chunk's leading overlap (except chunk
    0) and concatenating reconstructs the original token sequence —
    i.e. windows tile the doc exactly, and the final window reaches
    the end."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )

    for c, o in ((8, 3), (4, 0)):
        _chunk_case(spark, c, o)


def _chunk_case(spark, c, o):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )

    stride = c - o
    for n in (0, 1, 7, 8, 9, 12, 13, 40):
        text = " ".join(f"w{i}" for i in range(n))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            text_profile.chunk_documents(docs, c, o).collect(),
            key=lambda r: r.chunk_id,
        )
        assert rows[0].chunk_id == 0
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        # overlap-aware reconstruction: chunk k starts at k*stride
        got = {}
        for r in rows:
            toks = r.chunk_text.split() if r.chunk_text else []
            assert len(toks) == r.n_chunk_tokens <= c
            for j, t in enumerate(toks):
                pos = r.chunk_id * stride + j
                assert got.get(pos, t) == t  # overlaps agree
                got[pos] = t
        assert len(got) == n  # every token covered exactly
        if n:
            assert [got[i] for i in range(n)] == text.split()


def test_funnel_requires_strict_order(spark):
    """The funnel counts ORDER, not presence: a user who clicks before
    ever viewing has not converted past step 0."""
    from datetime import datetime as dt

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        events,
    )

    t = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: clicked before viewing -> stops at view
        (2, t(1), "click"), (2, t(2), "view"),
        # u3: view+click, purchase BEFORE the click -> stops at click
        (3, t(1), "view"), (3, t(2), "purchase"), (3, t(3), "click"),
        # u4: never viewed -> not in the funnel at all
        (4, t(1), "purchase"),
        # u5: click at the SAME instant as view -> strictness excludes
        (5, t(1), "view"), (5, t(1), "click"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, ty) for u, ts, ty in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.step_name: (r.n_users, r.conversion)
        for r in events.funnel_counts(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert got["view"] == (4, 1.0)       # u1, u2, u3, u5
    assert got["click"] == (2, 0.5)      # u1, u3
    assert got["purchase"] == (1, 0.25)  # u1 only


def test_funnel_matches_bruteforce_on_random_histories(spark):
    """Property: the windowed funnel equals a per-user sequential
    brute force (greedy earliest-step walk) on randomized event
    histories — seeds fixed for reproducibility."""
    import random
    from datetime import datetime, timedelta

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        events,
    )

    steps = ["a", "b", "c"]
    rng = random.Random(20260814)
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (
                    u,
                    base + timedelta(minutes=rng.randint(0, 30)),
                    rng.choice(steps + ["x"]),
                )
            )
    if not rows:
        rows = [(0, base, "a")]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )

    # brute force: greedy earliest-completion walk per user
    per_user: dict = {}
    for u, ts, ty in rows:
        per_user.setdefault(u, []).append((ts, ty))
    counts = [0] * len(steps)
    for hist in per_user.values():
        prev = None
        for i, s in enumerate(steps):
            cands = [
                ts
                for ts, ty in hist
                if ty == s and (prev is None or ts > prev)
            ]
            if not cands:
                break
            prev = min(cands)
            counts[i] += 1

    got = {
        r.step: r.n_users
        for r in events.funnel_counts(ev, steps).collect()
    }
    assert got == {i: c for i, c in enumerate(counts)}


def test_repetition_stats_matches_bruteforce_on_random_texts(spark):
    """Property: the Arrow pass equals a direct Counter-based
    reference on randomized token sequences (fixed seed)."""
    import random
    from collections import Counter

    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
        text_profile,
    )

    rng = random.Random(20260814)
    vocab = ["a", "b", "c", "dd", "eee"]
    rows = []
    for i in range(30):
        n = rng.randint(0, 15)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r for r in text_profile.repetition_stats(docs).collect()
    }
    for i, text in rows:
        toks = text.lower().split()
        n = len(toks)
        r = got[i]
        assert r.n_tokens == n
        if n == 0:
            assert r.top_token_frac == 0.0
            continue
        tc = Counter(toks)
        assert r.n_distinct == len(tc)
        assert r.dup_token_frac == (n - len(tc)) / n
        assert r.top_token_frac == max(tc.values()) / n
        bi = Counter(" ".join(toks[j : j + 2]) for j in range(n - 1))
        assert r.top_bigram_frac == (
            max(bi.values()) / (n - 1) if n > 1 else 0.0
        )
        tri = Counter(" ".join(toks[j : j + 3]) for j in range(n - 2))
        assert r.dup_trigram_frac == (
            sum(c for c in tri.values() if c > 1) / (n - 2) if n > 2 else 0.0
        )
