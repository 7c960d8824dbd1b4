"""Round-10 additions: Unicode normalization gate (NFKC + accent
strip) ahead of fingerprint-keyed dedup, the sampled dedup-recall
ground truth, and the multiset-safe relation fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.functions.text import (
    unicode_normalize_py,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    text_profile,
)


class TestUnicodeNormalize:
    def test_nfc_nfd_twins_collapse(self, spark):
        # 'café' composed (U+00E9) vs decomposed (e + U+0301): byte
        # distinct, visually identical — must share one fingerprint
        # and one keeper
        docs = spark.createDataFrame(
            [
                (1, "café menu"),
                (2, "café menu"),
                (3, "unrelated text"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in text_profile.unicode_exact_keepers(docs).collect()
        }
        assert out[1]["ufp"] == out[2]["ufp"]
        assert out[1]["keeper_doc_id"] == 1 and out[2]["keeper_doc_id"] == 1
        assert out[3]["keeper_doc_id"] == 3
        assert out[3]["ufp"] != out[1]["ufp"]
        # the plain (non-unicode) fingerprints keep the twins DISTINCT
        # — the gap this gate closes
        plain = {
            r["doc_id"]: r["fp"]
            for r in text_profile.fingerprints(docs).collect()
        }
        assert plain[1] != plain[2]

    def test_normalizer_semantics(self):
        # NFKC compatibility folds: full-width latin, ligature, NBSP
        assert unicode_normalize_py("ＨＥＬＬO") == "hello"
        assert unicode_normalize_py("oﬃce") == "office"
        assert unicode_normalize_py("a b") == "a b"
        # accent strip after decomposition
        assert unicode_normalize_py("Crème BRÛLÉE") == "creme brulee"
        # whitespace collapse + trim, ascii lowercase
        assert unicode_normalize_py("  A\t\nB  ") == "a b"
        # ascii text reduces to lower+collapse (the oracle equivalence)
        assert unicode_normalize_py("Plain ASCII  text") == "plain ascii text"

    def test_ufp_long_matches_md5_prefix(self, spark):
        docs = spark.createDataFrame(
            [(7, "Some Text")], "doc_id long, text string"
        )
        r = text_profile.unicode_fingerprints(docs).collect()[0]
        assert r["ufp_long"] == int(r["ufp"][:15], 16)


class TestSampledDedupRecall:
    def test_full_mode_supersets_sampled(self, spark, sf_dir):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.plans import (
            pipeline_queries as pq,
        )

        sampled = pq.dedup_recall_report(spark, sf_dir).collect()[0]
        full = pq.dedup_recall_report(
            spark, sf_dir, sample_mod=None
        ).collect()[0]
        # the ladder side is identical (full corpus in both modes);
        # the sampled ground truth is a subset of the full one
        assert sampled["n_ladder_pairs"] == full["n_ladder_pairs"]
        assert sampled["n_exact_pairs"] <= full["n_exact_pairs"]
        assert sampled["n_hits"] <= sampled["n_exact_pairs"]
        # precision is exact by construction in both modes: every
        # sampled true pair the ladder found is a ladder pair
        assert full["n_hits"] <= full["n_ladder_pairs"]


class TestImageDhash:
    @staticmethod
    def _media(spark, texts):
        rows = [
            (i, "image", t.encode(), len(t.encode()))
            for i, t in enumerate(texts)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary, n_bytes int"
        )

    def test_locality_and_discrimination(self, spark):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            multimodal,
        )

        base = " ".join(f"tok{i}" for i in range(60))
        edited = base.replace("tok7", "zzz", 1)  # one token swapped
        other = " ".join(f"other{i}" for i in range(60))
        media = self._media(spark, [base, edited, other])
        h = {
            r["doc_id"]: r["dhash"]
            for r in multimodal.image_hashes(media).collect()
        }
        ham = lambda a, b: bin(h[a] ^ h[b]).count("1")
        # one token edit perturbs <= 2 histogram buckets -> <= 4
        # gradient bits (possibly 0: a count bump that does not flip
        # any adjacent > relation); an unrelated doc lands much farther
        assert ham(0, 1) <= 4
        assert ham(0, 2) > 4
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in multimodal.image_dhash_pairs(
                media, max_hamming=4
            ).collect()
        }
        assert (0, 1) in pairs and (0, 2) not in pairs

    def test_banded_equals_bruteforce(self, spark, sf_dir):
        """Full-recall regime (max_hamming <= bands-1): the banded
        retrieval must return EXACTLY the quadratic hamming pair set —
        recall 1.0 and precision 1.0 against brute force."""
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            multimodal,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        media = multimodal.documents_as_media(docs)
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in multimodal.image_dhash_pairs(
                media, max_hamming=2
            ).collect()
        }
        fps = sorted(
            (r["doc_id"], r["dhash"])
            for r in multimodal.image_hashes(media).collect()
        )
        brute = {
            (a_id, b_id, bin(a_h ^ b_h).count("1"))
            for i, (a_id, a_h) in enumerate(fps)
            for b_id, b_h in fps[i + 1 :]
            if bin(a_h ^ b_h).count("1") <= 2
        }
        assert got == brute and brute

    def test_hash_range_and_media_filter(self, spark):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            multimodal,
        )

        rows = [
            (0, "image", b"a b c", 5),
            (1, "audio", b"a b c", 5),  # filtered out
        ]
        media = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary, n_bytes int"
        )
        out = multimodal.image_hashes(media).collect()
        assert [r["doc_id"] for r in out] == [0]
        assert 0 <= out[0]["dhash"] < (1 << 63)
        assert 0 <= out[0]["ahash"] < (1 << 63)

    def test_real_path_env_gated(self, spark):
        import pytest

        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            multimodal,
        )

        try:
            import PIL  # noqa: F401

            pytest.skip("PIL present: real path exercised elsewhere")
        except ImportError:
            pass
        media = self._media(spark, ["some text"])
        with pytest.raises(NotImplementedError, match="PIL"):
            multimodal.image_hashes(media, fake=False)


class TestCurateUnicodeNormalize:
    def test_funnel_twins_collapse_only_when_opted_in(self, spark):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.streaming.corpus import (
            curate_batch,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and then the "
            "café door closed"
        )
        import unicodedata

        nfd = unicodedata.normalize("NFD", base)
        assert nfd != base  # genuinely byte-distinct decomposed twin
        rows = [
            (1, base, "en", "a", 0),
            (2, nfd, "en", "a", 0),  # NFD twin of doc 1
            (3, "the quick brown fox naps under the old oak tree near "
                "the river", "en", "a", 0),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "quality int"
        )
        eval_docs = docs.filter("doc_id < 0")  # empty eval set
        plain = curate_batch(docs, eval_docs, min_overlap=10**6)
        fps = {r["doc_id"]: r["text_fp"] for r in plain.collect()}
        assert fps[1] != fps[2], "byte-distinct twins stay distinct by default"
        normed = curate_batch(
            docs, eval_docs, min_overlap=10**6, unicode_normalize=True
        )
        nfps = {r["doc_id"]: r for r in normed.collect()}
        assert nfps[1]["text_fp"] == nfps[2]["text_fp"]
        # the stored curated text is the canonical form
        assert nfps[1]["text"] == nfps[2]["text"]
        assert nfps[3]["text_fp"] != nfps[1]["text_fp"]


class TestBpeArtifact:
    @staticmethod
    def _docs(spark):
        rows = [
            (i, "the banana band banded bandana " * 3 + f"tail{i}", "en",
             "s", 0)
            for i in range(20)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "quality int"
        )

    def test_save_load_roundtrip_identical_segmentation(
        self, spark, tmp_path
    ):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            bpe,
        )

        merges = bpe.train_merges(self._docs(spark), n_merges=12)
        assert merges
        path = str(tmp_path / "tok")
        bpe.save_merges(spark, merges, path)
        loaded = bpe.load_merges(spark, path)
        assert loaded == merges
        for w in ("banana", "banded", "bandana", "unseen"):
            assert bpe.segment_len(w, loaded) == bpe.segment_len(w, merges)
        assert bpe.merges_fingerprint(loaded) == bpe.merges_fingerprint(
            merges
        )
        # rank order is semantic: a reordered table is a DIFFERENT
        # tokenizer and must fingerprint differently
        assert bpe.merges_fingerprint(
            list(reversed(merges))
        ) != bpe.merges_fingerprint(merges)

    def test_load_rejects_corrupt_ranks(self, spark, tmp_path):
        import pytest

        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            bpe,
        )

        path = str(tmp_path / "tok_bad")
        spark.createDataFrame(
            [(0, "a\x01b"), (2, "c\x01d")], "rank int, pair string"
        ).write.parquet(path)
        with pytest.raises(ValueError, match="not dense"):
            bpe.load_merges(spark, path)

    def test_builder_guard_refuses_changed_tokenizer(self, spark, tmp_path):
        import pytest

        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.corpus_pipeline import (
            CorpusPipeline,
            DatasetBuilder,
        )
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            bpe,
            partitioning,
        )

        docs = self._docs(spark)
        eval_docs = partitioning.hash_sample(docs, "doc_id", 0.05, salt="e")
        merges = bpe.train_merges(docs, n_merges=8)
        builder = DatasetBuilder(CorpusPipeline(spark, str(tmp_path / "c")))
        snap = builder.build(
            docs, eval_docs, budget_docs=10, epoch=0,
            quality_min=0, min_overlap=10**6, tokenizer_merges=merges,
        )
        assert builder.read(snap).count() > 0
        # the artifact is on disk and loads back to the same tokenizer
        fp = bpe.merges_fingerprint(merges)
        assert builder.load_tokenizer("bpe:" + fp) == merges
        # identical rebuild = legitimate replay (no-op commit)
        builder.build(
            docs, eval_docs, budget_docs=10, epoch=0,
            quality_min=0, min_overlap=10**6, tokenizer_merges=merges,
        )
        # a DIFFERENT tokenizer on the same epoch must refuse
        other = bpe.train_merges(docs, n_merges=3)
        assert other != merges
        with pytest.raises(ValueError, match="different config"):
            builder.build(
                docs, eval_docs, budget_docs=10, epoch=0,
                quality_min=0, min_overlap=10**6, tokenizer_merges=other,
            )
        # ...and so must dropping the tokenizer entirely
        with pytest.raises(ValueError, match="different config"):
            builder.build(
                docs, eval_docs, budget_docs=10, epoch=0,
                quality_min=0, min_overlap=10**6,
            )


def test_relation_fingerprint_multiset_sensitive(spark):
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.corpus_pipeline import (
        _relation_fingerprint,
    )

    mk = lambda ids: spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    )
    # xor self-cancellation classes: {a,a,b} vs {c,c,b} share count
    # and xor; {a,a,b} vs {a,b,b} share count, distinct-count and
    # set-xor — the sum-based fingerprint separates all of them
    a = _relation_fingerprint(mk([1, 1, 2]), "doc_id")
    b = _relation_fingerprint(mk([3, 3, 2]), "doc_id")
    c = _relation_fingerprint(mk([1, 2, 2]), "doc_id")
    assert len({a, b, c}) == 3
    # order/partitioning insensitive
    d = _relation_fingerprint(mk([2, 1, 1]).repartition(7), "doc_id")
    assert d == a


class TestAdaptiveQualityKeep:
    def _run(self, spark, rows, keep):
        scored = spark.createDataFrame(
            rows, "doc_id long, source string, score long"
        )
        return text_profile.adaptive_quality_keep(
            scored, "score", keep_fraction=keep
        )

    def test_per_group_thresholds_differ(self, spark):
        # src A scores 10..14, src B scores 90..94: a global cutoff
        # at the corpus p20 would gut A and keep all of B; the
        # adaptive gate drops exactly one (bottom 20%) from EACH
        rows = [(i, "A", 10 + i) for i in range(5)] + [
            (10 + i, "B", 90 + i) for i in range(5)
        ]
        kept = {r.doc_id for r in self._run(spark, rows, 0.8).collect()}
        assert kept == {1, 2, 3, 4, 11, 12, 13, 14}

    def test_tie_at_cut_resolves_by_id(self, spark):
        # all-equal scores: rank orders by id, so the LOWEST ids drop
        rows = [(i, "A", 7) for i in range(4)]
        kept = {r.doc_id for r in self._run(spark, rows, 0.5).collect()}
        assert kept == {2, 3}

    def test_keep_fraction_one_keeps_all(self, spark):
        rows = [(i, "A", i) for i in range(3)]
        assert self._run(spark, rows, 1.0).count() == 3

    def test_small_group_drops_nothing_below_one(self, spark):
        # n=3, drop = floor(3*0.2) = 0 -> nothing dropped
        rows = [(i, "A", i) for i in range(3)]
        assert self._run(spark, rows, 0.8).count() == 3

    def test_bad_fraction_raises(self, spark):
        import pytest

        rows = [(1, "A", 1)]
        with pytest.raises(ValueError, match="keep_fraction"):
            self._run(spark, rows, 0.0)
        with pytest.raises(ValueError, match="keep_fraction"):
            self._run(spark, rows, 1.5)


class TestGopherGates:
    def _gate(self, spark, texts, **kw):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return {
            r.doc_id: r
            for r in text_profile.gopher_gates(docs, **kw).collect()
        }

    def test_clean_doc_passes_all(self, spark):
        text = "the cat and the dog have fun with all of that stuff " * 5
        got = self._gate(spark, [text])[0]
        assert got.gopher_ok and got.words_ok and got.required_words_ok

    def test_word_count_band(self, spark):
        short = "the of and that have with be to"  # 8 words < 50
        got = self._gate(spark, [short])[0]
        assert not got.words_ok and not got.gopher_ok

    def test_mean_word_length_rules(self, spark):
        # single-char words -> mean 1 < 3; 12-char words -> mean > 10
        tiny = " ".join(["a"] * 60)
        huge = " ".join(["extravagance"] * 60)
        got = self._gate(spark, [tiny, huge])
        assert not got[0].mean_len_ok and not got[1].mean_len_ok

    def test_symbol_ratio(self, spark):
        # 60 words but 10 hashes + ellipses -> 12 symbols > 6 = 10%
        base = "the cat and dog have fun with some of that " * 6
        noisy = base + "##########" + "... " * 2
        got = self._gate(spark, [noisy])[0]
        assert not got.symbol_ok

    def test_alpha_ratio(self, spark):
        # 30 numeric tokens of 60 -> 50% alphabetic < 80%
        words = ("the word " * 15) + ("12345 67890 " * 15)
        got = self._gate(spark, [words])[0]
        assert not got.alpha_ok

    def test_bullet_and_ellipsis_lines(self, spark):
        body = "the cat and the dog have fun with all of that " * 5
        bullets = "\n".join(f"- item {i}" for i in range(10)) + "\n" + body
        dots = "\n".join(f"line {i} trails..." for i in range(9)) + "\n" + body
        got = self._gate(spark, [bullets, dots])
        assert not got[0].bullet_ok
        assert not got[1].ellipsis_ok
        # the single-line doc passes both vacuously
        got1 = self._gate(spark, [body])[0]
        assert got1.bullet_ok and got1.ellipsis_ok

    def test_required_words_parameterized(self, spark):
        text = "alpha beta gamma delta " * 20
        default = self._gate(spark, [text])[0]
        custom = self._gate(
            spark, [text], required_words=["alpha", "beta"]
        )[0]
        assert not default.required_words_ok
        assert custom.required_words_ok


class TestCorpusHealth:
    def test_report_values(self, spark):
        clone = "the cat and a dog have fun with all of that stuff today"
        rows = [
            (1, clone, "en", "sA", 0),
            (2, clone, "en", "sA", 0),                 # exact dup
            (3, "a b", "en", "sA", 0),                 # short, low quality
            (4, "the quick brown fox jumps over a lazy dog again and again ok", "en", "sB", 0),
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        got = {
            r.source: r
            for r in text_profile.corpus_health(
                docs,
                gopher_kwargs=dict(
                    min_words=10, max_words=1000,
                    required_words=["the", "a"],
                ),
            ).collect()
        }
        a = got["sA"]
        assert a.n_docs == 3
        assert a.n_exact_dup_surplus == 1  # the clone pair
        assert a.n_tokens == 13 + 13 + 2
        b = got["sB"]
        assert b.n_docs == 1 and b.n_gopher_pass == 1
        # centi-mean is exact integer: doc 4 scores 100 -> 10000
        assert b.mean_quality_centi == 10000

    def test_facade_hook(self, spark):
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.corpus_pipeline import (
            CorpusPipeline,
        )

        docs = spark.createDataFrame(
            [(1, "the cat sat", "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        cp = CorpusPipeline(spark, "/tmp/unused_corpus_root")
        assert cp.health_report(docs).count() == 1
