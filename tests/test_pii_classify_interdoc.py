"""Unit tests for the round-5 additions: PII scan/redaction, the
hashed linear quality classifier, and inter-document duplicate n-gram
coverage — crafted inputs with hand-computable expectations (the
driver's oracle gate covers the corpus-scale parity)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    classify,
    pii,
    text_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPiiScan:
    def test_counts_and_redaction(self, spark):
        docs = _docs(
            spark,
            [
                (1, "mail a@b.cc and c.d+x@e-f.org, ip 10.0.0.1, tel 555-123-4567"),
                (2, "no pii at all"),
                (3, "edge 999.999.999.999 and 1.2.3 and 12-345-6789"),
            ],
        )
        got = {r["doc_id"]: r for r in pii.pii_scan(docs).collect()}
        assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 1, 1)
        assert got[1]["n_pii"] == 4
        assert got[1]["redacted"] == (
            "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE>"
        )
        assert got[2]["n_pii"] == 0 and got[2]["redacted"] == "no pii at all"
        # 999.999.999.999 still matches the \d{1,3} quad shape (no
        # range check — standard scrubber behavior); 1.2.3 and a
        # misgrouped phone do not
        assert (got[3]["n_ip"], got[3]["n_phone"]) == (1, 0)

    def test_counts_are_on_original_text(self, spark):
        # a digit-only host is NOT an email (the TLD requires letters)
        # but its quad shape IS an IP — class independence on the
        # original text, and the IP redaction still fires
        docs = _docs(spark, [(1, "x u@1.2.3.44 y")])
        row = pii.pii_scan(docs).collect()[0]
        assert row["n_email"] == 0 and row["n_ip"] == 1
        assert row["redacted"] == "x u@<IP> y"

    def test_synthetic_seeding_every_third_doc(self, spark):
        docs = _docs(spark, [(i, "base") for i in range(6)])
        seeded = pii.pii_scan(pii.with_synthetic_pii(docs)).collect()
        for r in seeded:
            if r["doc_id"] % 3 == 0:
                assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1)
            else:
                assert r["n_pii"] == 0

    def test_plan_is_one_scan_no_exchange(self, spark):
        docs = _docs(spark, [(1, "a")])
        plan = pii.pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestHashedLinearScore:
    @staticmethod
    def _expected(text: str) -> tuple[int, int]:
        toks = text.lower().strip().split()
        s = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            b = h % classify.N_BUCKETS
            w = (
                int(hashlib.md5(f"w|{b}".encode()).hexdigest()[:15], 16)
                % classify.WEIGHT_SPAN
                - classify.WEIGHT_OFFSET
            )
            s += w
        return len(toks), s

    def test_matches_reference_computation(self, spark):
        texts = [
            "The quick brown fox jumps over the lazy dog",
            "the the the",
            "one",
        ]
        docs = _docs(spark, list(enumerate(texts)))
        got = {
            r["doc_id"]: r
            for r in classify.hashed_linear_score(docs).collect()
        }
        for i, text in enumerate(texts):
            n, s = self._expected(text)
            assert (got[i]["n_tokens"], got[i]["score_sum"]) == (n, s)
            assert got[i]["keep"] == (s >= classify.KEEP_THRESHOLD)

    def test_empty_doc_survives_with_zero_score(self, spark):
        docs = _docs(spark, [(1, ""), (2, "   "), (3, "word")])
        got = {r["doc_id"]: r for r in classify.hashed_linear_score(docs).collect()}
        assert len(got) == 3
        assert (got[1]["n_tokens"], got[1]["score_sum"]) == (0, 0)
        assert (got[2]["n_tokens"], got[2]["score_sum"]) == (0, 0)
        assert got[3]["n_tokens"] == 1


class TestInterdocDupStats:
    def test_shared_vs_unique_content(self, spark):
        shared = "abcdefghijklmnop"  # 16 chars -> 9 distinct 8-grams
        docs = _docs(
            spark,
            [
                (1, shared),
                (2, shared),
                (3, "zzzzzzzzzzzzzzzz"),  # one distinct 8-gram, unshared
                (4, "short"),  # < n chars -> zero grams
            ],
        )
        got = {
            r["doc_id"]: r
            for r in text_profile.interdoc_dup_stats(docs, n=8).collect()
        }
        assert len(got) == 4
        assert (got[1]["n_grams"], got[1]["n_dup_grams"]) == (9, 9)
        assert got[1]["dup_permille"] == 1000
        assert got[2]["dup_permille"] == 1000
        assert (got[3]["n_grams"], got[3]["n_dup_grams"]) == (1, 0)
        assert got[3]["dup_permille"] == 0
        assert (got[4]["n_grams"], got[4]["dup_permille"]) == (0, 0)

    def test_partial_overlap_permille(self, spark):
        # doc 1: 'aaaaaaaaXbbbbbbbb' shares only the 'a'*8 gram with doc 2
        docs = _docs(spark, [(1, "aaaaaaaaXbbbbbbbb"), (2, "aaaaaaaa")])
        got = {
            r["doc_id"]: r
            for r in text_profile.interdoc_dup_stats(docs, n=8).collect()
        }
        n1 = got[1]["n_grams"]
        assert got[1]["n_dup_grams"] == 1
        assert got[1]["dup_permille"] == 1000 // n1
        assert got[2] and got[2]["dup_permille"] == 1000


class TestCompressionStats:
    def test_signal_separates_repetitive_from_noise(self, spark):
        import hashlib

        noise = "".join(
            hashlib.md5(str(i).encode()).hexdigest() for i in range(40)
        )
        docs = _docs(
            spark,
            [(1, "spam " * 400), (2, noise), (3, "")],
        )
        got = {
            r["doc_id"]: r
            for r in text_profile.compression_stats(docs).collect()
        }
        assert len(got) == 3
        # heavy repetition compresses to a tiny fraction; hex noise
        # stays close to incompressible
        assert got[1]["compression_permille"] < 100
        assert got[2]["compression_permille"] > 500
        assert (got[3]["n_bytes"], got[3]["compression_permille"]) == (0, 0)

    def test_deterministic_across_runs(self, spark):
        docs = _docs(spark, [(i, f"doc number {i} " * (i + 1)) for i in range(20)])
        a = sorted(map(tuple, text_profile.compression_stats(docs).collect()))
        b = sorted(map(tuple, text_profile.compression_stats(docs).collect()))
        import zlib

        expect = len(zlib.compress(("doc number 0 ").encode(), 6))
        assert a == b
        assert a[0][2] == expect

    def test_permille_is_exact_integer_division(self, spark):
        import zlib

        text = "example payload " * 7
        docs = _docs(spark, [(1, text)])
        row = text_profile.compression_stats(docs).collect()[0]
        raw = text.encode()
        comp = zlib.compress(raw, 6)
        assert row["n_bytes"] == len(raw)
        assert row["n_compressed"] == len(comp)
        assert row["compression_permille"] == len(comp) * 1000 // len(raw)


class TestSimhashNearPairs:
    def test_recall_and_precision_vs_brute_force(self, spark):
        import itertools

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "a completely different document about spark plans",
            "the quick brown fox jumps over the lazy dog",
            "numbers one two three four five six seven eight",
        ]
        docs = _docs(spark, list(enumerate(texts)))
        from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
            dedup,
        )

        bits, bands, maxh = 16, 4, 3
        fps = {
            r["doc_id"]: r["simhash"]
            for r in dedup.simhash_fingerprints(docs, bits).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(
                docs, bits, bands, maxh
            ).collect()
        }
        # precision: every returned hamming is exact and <= max
        for (a, b), h in got.items():
            assert h == bin(fps[a] ^ fps[b]).count("1") <= maxh
        # recall: pigeonhole guarantees every pair at hamming <= bands-1
        for a, b in itertools.combinations(sorted(fps), 2):
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= bands - 1:
                assert (a, b) in got, (a, b, h)
        # the exact-clone pair (0, 3) is always found at hamming 0
        assert got.get((0, 3)) == 0
