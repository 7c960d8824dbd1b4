"""13-language language-ID matrix (stopword hits + script priors):
real-language snippets resolve correctly, Latin/ASCII predictions are
unchanged from the 5-language matrix (no script prior on a shared
script), and kana decides Japanese over Chinese while pure ideographs
tie back to zh."""

from __future__ import annotations

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.text_profile import (
    language_id,
)

SNIPPETS = [
    # (lang, text)
    ("en", "the cat sat on the mat and the dog is in a house"),
    ("de", "der hund und die katze sind ein gutes team das ist schön"),
    ("fr", "le chat et la souris sont dans les champs un jour est venu"),
    ("es", "el perro y los gatos en un parque es muy bonito"),
    ("ru", "и вот в лесу не было на что это похоже"),
    ("ar", "في البيت من الصباح على الطاولة أن يكون إلى الغد عن كل شيء"),
    ("hi", "यह घर है और उस के अंदर में एक मेज़ की ओर से"),
    ("pt", "que bom não ter uma casa por aqui com tudo para todos"),
    ("it", "che bello di vedere il mare per ore non sono stanco"),
    ("ja", "東京都の天気は晴れです明日も続くでしょう"),
    ("ko", "서울의 날씨가 좋습니다 내일도 계속됩니다"),
    ("th", "สวัสดีครับวันนี้อากาศดีมาก"),
    ("zh", "今天天气很好明天也会继续"),
]


def test_matrix_resolves_each_language(spark):
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(SNIPPETS)],
        "doc_id long, lang string, text string",
    )
    got = {
        r.lang_true: r.lang_pred
        for r in language_id(docs, token_mode="mixed").collect()
    }
    for lang, _ in SNIPPETS:
        assert got[lang] == lang, f"{lang} predicted as {got[lang]}"


def test_kana_decides_japanese_ideographs_tie_to_zh(spark):
    docs = spark.createDataFrame(
        [
            (1, "ja", "東京の天気は晴れ"),   # kana present -> ja
            (2, "zh", "東京天氣晴明日続"),   # ideographs only -> zh tie-break
        ],
        "doc_id long, lang string, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert got[1] == "ja"
    assert got[2] == "zh"


def test_script_prior_never_outranks_a_stopword(spark):
    # one English stopword hit beats any amount of foreign script
    docs = spark.createDataFrame(
        [(1, "en", "the " + "好" * 5000)],
        "doc_id long, lang string, text string",
    )
    [row] = language_id(docs).collect()
    assert row.lang_pred == "en"


def test_ascii_predictions_match_pre_extension_argmax(spark):
    """On pure-ASCII text the score argmax reduces to the original
    5-language stopword argmax: no new-language stopword appears, no
    script prior fires."""
    docs = spark.createDataFrame(
        [
            (1, "en", "the table and a key value row"),
            (2, "de", "der die und das ist ein"),
            (3, "zh", "de5 shi4 bu4 le5 zai4"),
            (4, "en", "key agg row scan slow fast"),  # zero hits -> en
        ],
        "doc_id long, lang string, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "zh", 4: "en"}
