"""Corpus-trained BPE tokenizer: hand-computed merge sequences,
segmentation semantics, per-doc counts, and the token_count_col /
token_counts hooks in pack/budget."""

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
    PAIR_SEP,
    bpe_token_counts,
    merge_table,
    segment_len,
    train_merges,
    word_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_train_merges_hand_computed(spark):
    # words: aa (count 2), ab (count 1).
    # step 1: pair (a,a) weight 2 beats (a,b) weight 1 -> merge: aa
    #         becomes [aa]; step 2: only (a,b) remains -> merge;
    # step 3: no pairs left -> stop early.
    docs = _docs(spark, ["aa aa ab"])
    merges = train_merges(docs)
    assert merges == [f"a{PAIR_SEP}a", f"a{PAIR_SEP}b"]


def test_train_merges_tiebreak_lexicographic(spark):
    # (a,b) and (c,d) both appear once: count tie -> encoded-pair ASC
    docs = _docs(spark, ["ab cd"])
    merges = train_merges(docs, n_merges=1)
    assert merges == [f"a{PAIR_SEP}b"]


def test_segment_len_lowest_rank_leftmost(spark):
    merges = [f"a{PAIR_SEP}a", f"a{PAIR_SEP}b"]
    assert segment_len("aab", merges) == 2  # (a,a) first -> [aa, b]
    assert segment_len("ab", merges) == 1
    assert segment_len("zzz", merges) == 3  # nothing applies
    assert segment_len("a", merges) == 1
    assert segment_len("", merges) == 0


def test_train_deterministic_and_partition_invariant(spark):
    rows = [f"the quick brown fox w{i} jumps" for i in range(30)]
    m1 = train_merges(_docs(spark, rows))
    m2 = train_merges(_docs(spark, rows).repartition(7))
    assert m1 == m2 and len(m1) > 0


def test_bpe_token_counts_bounds_and_empty_docs(spark):
    docs = _docs(spark, ["hello world hello", "", "xy"])
    merges = train_merges(docs)
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    assert len(out) == 3
    assert out[1]["n_ws_tokens"] == 0 and out[1]["n_bpe_tokens"] == 0
    for r in out.values():
        # every word is >= 1 and <= len(word) subwords
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"]
    assert out[0]["n_ws_tokens"] == 3


def test_merge_table_relation(spark):
    docs = _docs(spark, ["aa aa ab"])
    mt = merge_table(docs, train_merges(docs)).collect()
    assert [(r["rank"], r["pair_left"], r["pair_right"]) for r in mt] == [
        (0, "a", "a"),
        (1, "a", "b"),
    ]


def test_word_counts_lowercased(spark):
    docs = _docs(spark, ["The THE the"])
    rows = word_counts(docs).collect()
    assert len(rows) == 1 and rows[0]["wcnt"] == 3


def test_pack_sequences_token_count_col(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.packing import (
        pack_sequences,
    )

    docs = _docs(spark, ["aaaa bbbb", "cccc dddd", "eeee ffff"])
    merges = train_merges(docs, n_merges=0)  # no merges: bpe = chars
    counted = docs.join(
        bpe_token_counts(docs, merges), "doc_id"
    )
    # whitespace denomination: 2 tokens/doc -> capacity 4 packs 2 docs
    ws = pack_sequences(docs, capacity=4, n_shards=1)
    assert ws.groupBy("pack_id").count().agg(F.max("count")).first()[0] == 2
    # bpe denomination: 8 subword tokens/doc -> each doc its own pack
    bp = pack_sequences(
        counted, capacity=8, n_shards=1, token_count_col="n_bpe_tokens"
    )
    assert bp.groupBy("pack_id").count().agg(F.max("count")).first()[0] == 1
    assert {r["n_tokens"] for r in bp.collect()} == {8}


def test_token_budget_select_token_counts(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.partitioning import (
        token_budget_select,
    )

    docs = _docs(spark, ["aaaa bbbb", "cccc dddd", "eeee ffff"])
    merges = train_merges(docs, n_merges=0)
    counts = bpe_token_counts(docs, merges).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    out = token_budget_select(docs, 16, token_counts=counts).collect()
    assert sum(r["selected"] for r in out) == 2  # 2 x 8 bpe tokens
    assert {r["n_tokens"] for r in out} == {8}
    ws = token_budget_select(docs, 16).collect()
    assert sum(r["selected"] for r in ws) == 3  # whitespace: 2/doc


def test_bpe_chunk_documents_windows_and_overlap(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
        bpe_chunk_documents,
    )

    # no merges -> bpe = chars: 3 words x 4 tokens, C=8 S=4
    docs = _docs(spark, ["aaaa bbbb cccc", ""])
    out = bpe_chunk_documents(
        docs, [], chunk_tokens=8, overlap=4
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # doc 0: windows [0,8) and [4,12): [w0 w1], [w1 w2]
    assert by[0][0]["chunk_text"] == "aaaa bbbb"
    assert by[0][1]["chunk_text"] == "bbbb cccc"
    assert len(by[0]) == 2
    assert by[0][0]["n_chunk_bpe"] == 8
    # zero-token doc emits one empty chunk
    assert by[1] == {0: by[1][0]}
    assert by[1][0]["chunk_text"] == "" and by[1][0]["n_chunk_bpe"] == 0


def test_bpe_chunk_short_doc_single_chunk_preserves_case(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
        bpe_chunk_documents,
        train_merges,
    )

    docs = _docs(spark, ["Hello World"])
    m = train_merges(docs)
    out = bpe_chunk_documents(docs, m, chunk_tokens=64, overlap=8).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "Hello World"  # original case kept
    assert out[0]["n_chunk_words"] == 2


def test_bpe_chunk_every_doc_contiguous(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
        bpe_chunk_documents,
        train_merges,
    )

    rows = [f"alpha beta gamma w{i} delta epsilon zeta" * 3 for i in range(12)]
    docs = _docs(spark, rows)
    m = train_merges(docs)
    out = bpe_chunk_documents(docs, m, chunk_tokens=16, overlap=4)
    agg = (
        out.groupBy("doc_id")
        .agg(
            F.min("chunk_id").alias("mn"),
            F.max("chunk_id").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(agg) == 12
    for r in agg:
        assert r["mn"] == 0 and r["n"] == r["mx"] + 1  # 0..k contiguous


def test_bpe_chunk_giant_word_repeats_per_window(spark):
    # documented corollary: a single word wider than the stride
    # intersects every window, so it appears verbatim in each; ids
    # stay contiguous and no chunk is empty
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
        bpe_chunk_documents,
    )

    docs = _docs(spark, ["aaaaaaaaaaaa"])  # 12 chars, C=8 S=4 -> 2 windows
    out = sorted(
        bpe_chunk_documents(docs, [], chunk_tokens=8, overlap=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in out] == [0, 1]
    assert all(r["chunk_text"] == "aaaaaaaaaaaa" for r in out)


def test_training_survives_separator_bearing_words(spark):
    # a token containing the \x01 pair-separator must not crash
    # training (encoded pairs would be ambiguous: best.split saw >2
    # parts pre-fix) — it is excluded from the dictionary; clean words
    # still train, and the dirty word still segments (to chars: its
    # pair keys never match the clean table)
    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa"), (2, "x\x01y x\x01y x\x01y x\x01y")],
        "doc_id long, text string",
    )
    merges = train_merges(docs, n_merges=4, top_words=10)
    assert merges  # clean pairs learned
    assert all("\x01\x01" not in m for m in merges)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert counts[2] == 4 * 3  # x,\x01,y per occurrence — chars, no merge


def test_incremental_trainer_equals_full_recount(spark):
    """The incremental pair-count trainer must pick the SAME merge
    sequence as a full recount per step (_best_pair) — on a corpus
    rich in repeated-pair words ("aaaa", overlapping merges) where a
    stale index or a wrong delta would diverge."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.bpe import (
        PAIR_SEP,
        _best_pair,
        _merge_leftmost,
        train_merges,
        word_counts,
    )

    texts = [
        "aaaa aaaa aaa banana banana bandana",
        "abab abab ababab cacao cacao",
        "the the the then them theme",
        "aaaa banana abab then",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n_merges in (1, 5, 12, 40):
        got = train_merges(docs, n_merges=n_merges, top_words=50)
        # reference: full recount per step
        top = (
            word_counts(docs)
            .orderBy(F.col("wcnt").desc(), F.col("word").asc())
            .limit(50)
            .collect()
        )
        vocab = [(list(r["word"]), int(r["wcnt"])) for r in top]
        want = []
        for _ in range(n_merges):
            best = _best_pair(vocab)
            if best is None:
                break
            if best not in want:
                want.append(best)
            l, r = best.split(PAIR_SEP)
            vocab = [(_merge_leftmost(s, l, r), c) for s, c in vocab]
        assert got == want, f"diverged at n_merges={n_merges}"
