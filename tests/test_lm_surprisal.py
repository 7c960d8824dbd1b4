"""CCNet-style bigram-LM surprisal scoring: exact integer values on a
hand-computed corpus, edge cases, and the scale plan shape."""

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
    LM_SCALE,
    lm_surprisal_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "zap"),
            (4, ""),
            (5, "the cat sat"),
        ],
        "doc_id long, text string",
    )


def test_hand_computed_values(spark):
    # corpus bigrams: (the,cat)x3 (cat,sat)x2 (cat,ran)x1
    # c1: the=3 cat=3; V={the,cat,sat,ran}=4
    # invp(the,cat)=(3+4)*S div 4; invp(cat,sat)=(3+4)*S div 3;
    # invp(cat,ran)=(3+4)*S div 2
    s = LM_SCALE
    i_tc = 7 * s // 4
    i_cs = 7 * s // 3
    i_cr = 7 * s // 2
    rows = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(_docs(spark)).collect()
    }
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["mean_invp_scaled"] == (i_tc + i_cs) // 2
    assert rows[1]["max_invp_scaled"] == i_cs
    assert rows[2]["mean_invp_scaled"] == (i_tc + i_cr) // 2
    assert rows[2]["max_invp_scaled"] == i_cr
    # identical docs score identically
    assert rows[5]["mean_invp_scaled"] == rows[1]["mean_invp_scaled"]
    # fluent (common transitions) scores BELOW surprising
    assert rows[1]["mean_invp_scaled"] < rows[2]["mean_invp_scaled"]


def test_short_and_empty_docs_present_with_null_stats(spark):
    rows = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(_docs(spark)).collect()
    }
    for did in (3, 4):  # single-token and empty: nothing to score
        assert rows[did]["n_bigrams"] == 0
        assert rows[did]["mean_invp_scaled"] is None
        assert rows[did]["max_invp_scaled"] is None
    assert len(rows) == 5  # every input doc present exactly once


def test_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "The Cat"), (2, "the cat")], "doc_id long, text string"
    )
    a, b = (
        lm_surprisal_stats(docs)
        .orderBy("doc_id")
        .select("mean_invp_scaled")
        .collect()
    )
    assert a[0] == b[0] and a[0] is not None


def test_plan_no_windows_no_crossjoin_blowup(spark):
    # scale shape: aggregates + key joins only — no window (global or
    # otherwise), and the only cartesian input is the broadcast 1-row
    # vocab relation
    from tests.test_plan_quality import plan_of

    plan = plan_of(lm_surprisal_stats(_docs(spark)))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # partial (map-side) aggregation present for the count/sum aggs
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_heldout_lm_scores_oov_at_laplace_floor(spark):
    lm = spark.createDataFrame(
        [(0, "the cat sat the cat sat")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "weird zap blorp"), (3, "the cat ran")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(docs, lm_docs=lm).collect()
    }
    s = LM_SCALE
    # LM grams: (the,cat)x2 (cat,sat)x2 (sat,the)x1; c1: the=2 cat=2;
    # V={the,cat,sat}=3
    assert rows[1]["mean_invp_scaled"] == 5 * s // 3
    # fully out-of-model doc: every gram at the Laplace floor V*S
    assert rows[2]["mean_invp_scaled"] == 3 * s
    assert rows[2]["max_invp_scaled"] == 3 * s
    # known context, unseen continuation: (c1+V)*S div 1
    assert rows[3]["max_invp_scaled"] == 5 * s
    # in-model text scores BELOW out-of-model text
    assert rows[1]["mean_invp_scaled"] < rows[2]["mean_invp_scaled"]


def test_lm_filter_fast_path_equals_lm_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"the cat sat {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    via_docs = lm_surprisal_stats(
        docs, lm_docs=docs.filter("doc_id % 2 = 0")
    )
    via_filter = lm_surprisal_stats(
        docs, lm_filter=F.expr("doc_id % 2 = 0")
    )
    a = sorted(map(tuple, via_docs.collect()))
    b = sorted(map(tuple, via_filter.collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at most one"):
        lm_surprisal_stats(docs, lm_docs=docs, lm_filter=F.lit(True))


def test_trigram_order_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b"), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(docs, n=3).collect()
    }
    s = LM_SCALE
    # trigrams: doc1: (a b,c)x2 (b c,a) (c a,b); doc3: (x y,z)
    # c1: 'a b'=2 'b c'=1 'c a'=1 'x y'=1; V={a,b,c,x,y,z}=6
    i_abc = (2 + 6) * s // 3
    i_bca = (1 + 6) * s // 2
    assert rows[1]["n_bigrams"] == 4
    assert rows[1]["max_invp_scaled"] == max(i_abc, i_bca)
    assert rows[1]["mean_invp_scaled"] == (
        2 * i_abc + 2 * i_bca
    ) // 4
    # 2-token doc has no trigram
    assert rows[2]["n_bigrams"] == 0 and rows[2]["mean_invp_scaled"] is None
    assert rows[3]["n_bigrams"] == 1
    assert rows[3]["mean_invp_scaled"] == (1 + 6) * s // 2


# ---------------------- round 8: count floor + per-language models


def test_min_count_prunes_to_laplace_floor(spark):
    """min_count=2 drops the singleton (cat,ran) gram from the model;
    everything downstream (c1, V) derives from the PRUNED relation and
    the pruned gram scores exactly like OOV (Laplace floor)."""
    s = LM_SCALE
    rows = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(_docs(spark), min_count=2).collect()
    }
    # pruned model: (the,cat)x3 (cat,sat)x2; c1: the=3 cat=2;
    # V={the,cat,sat}=3
    i_tc = (3 + 3) * s // 4
    i_cs = (2 + 3) * s // 3
    i_cr = (2 + 3) * s // 1  # pruned -> floor with known ctx 'cat'
    assert rows[1]["mean_invp_scaled"] == (i_tc + i_cs) // 2
    assert rows[2]["mean_invp_scaled"] == (i_tc + i_cr) // 2
    assert rows[2]["max_invp_scaled"] == i_cr
    # pruning only ever RAISES surprisal (model shrinks)
    base = {
        r["doc_id"]: r for r in lm_surprisal_stats(_docs(spark)).collect()
    }
    assert rows[2]["mean_invp_scaled"] > base[2]["mean_invp_scaled"]


def test_model_rows_bound_keeps_lazy_and_matches(spark):
    """model_rows (a caller-known model-size bound) replaces the
    plan-build count: construction stays fully lazy and the scores are
    identical whichever side of the broadcast threshold the bound
    lands on."""
    from unittest.mock import patch

    base = sorted(
        map(
            tuple,
            lm_surprisal_stats(_docs(spark), min_count=2).collect(),
        )
    )
    with patch(
        "pyspark.sql.DataFrame.count",
        side_effect=AssertionError("eager count at plan-build"),
    ):
        lo = lm_surprisal_stats(_docs(spark), min_count=2, model_rows=2)
        hi = lm_surprisal_stats(
            _docs(spark), min_count=2, model_rows=10**9
        )
    assert sorted(map(tuple, lo.collect())) == base
    assert sorted(map(tuple, hi.collect())) == base


def test_min_count_one_is_identity_and_validates(spark):
    import pytest as _pytest

    a = sorted(map(tuple, lm_surprisal_stats(_docs(spark)).collect()))
    b = sorted(
        map(tuple, lm_surprisal_stats(_docs(spark), min_count=1).collect())
    )
    assert a == b
    with _pytest.raises(ValueError, match="min_count"):
        lm_surprisal_stats(_docs(spark), min_count=0)


def _bilingual(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat", "en"),
            (2, "the cat ran", "en"),
            (3, "le chat dort", "fr"),
            (4, "le chat mange", "fr"),
            (5, "solo", "es"),  # <2 tokens: empty es model
        ],
        "doc_id long, text string, lang string",
    )


def test_per_language_models_are_isolated(spark):
    """Each doc scores only against its own language's model: the en
    scores with lang_col are bit-identical to scoring the en subset
    alone with a shared model."""
    docs = _bilingual(spark)
    per_lang = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(docs, lang_col="lang").collect()
    }
    en_only = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(docs.filter("lang = 'en'")).collect()
    }
    for did in (1, 2):
        for c in ("n_bigrams", "mean_invp_scaled", "max_invp_scaled"):
            assert per_lang[did][c] == en_only[did][c]
    # output carries the language key; every input doc present
    assert per_lang[3]["lang"] == "fr"
    assert len(per_lang) == 5
    # a language with an empty model: nothing to score, NULL stats
    assert per_lang[5]["n_bigrams"] == 0
    assert per_lang[5]["mean_invp_scaled"] is None


def test_shared_model_misscores_vs_per_language(spark):
    """The motivating defect: a SHARED model counts cross-language
    vocabulary into V, inflating every language's Laplace smoothing —
    per-language models score fluent text lower (less surprising)."""
    docs = _bilingual(spark)
    shared = {
        r["doc_id"]: r for r in lm_surprisal_stats(docs).collect()
    }
    per_lang = {
        r["doc_id"]: r
        for r in lm_surprisal_stats(docs, lang_col="lang").collect()
    }
    assert (
        per_lang[1]["mean_invp_scaled"] < shared[1]["mean_invp_scaled"]
    )


def test_per_language_plan_shape(spark):
    from tests.test_plan_quality import plan_of

    plan = plan_of(lm_surprisal_stats(_bilingual(spark), lang_col="lang"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_counts_floor_and_lang(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
        bigram_lm_counts,
    )

    docs = _bilingual(spark)
    c = bigram_lm_counts(docs, lang_col="lang")
    assert set(c.columns) == {"lang", "ctx", "w", "c2"}
    # (le, chat) appears once per fr doc -> c2=2 under the fr model
    fr = {(r["ctx"], r["w"]): r["c2"] for r in c.filter("lang='fr'").collect()}
    assert fr[("le", "chat")] == 2
    pruned = bigram_lm_counts(docs, lang_col="lang", min_count=2)
    assert {(r["ctx"], r["w"]) for r in pruned.collect()} == {("le", "chat"), ("the", "cat")}
