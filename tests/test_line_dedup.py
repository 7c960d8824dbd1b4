"""Line/segment-level dedup (boilerplate removal): dedup.line_dedup.

Semantics under test (RefinedWeb line-wise corrections):
- a segment occurring verbatim in >= min_docs DISTINCT docs is cut
  from EVERY doc (no keeper copy — boilerplate is noise in each);
- within-doc repetition alone never triggers a cut (doc-frequency,
  not occurrence-frequency);
- unique content passes through byte-identical;
- both segmenters (newline lines / fixed word windows) feed the same
  cut/reassemble kernel.
"""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSegmentDocuments:
    def test_lines_segmenter_drops_blank_lines(self, spark):
        docs = _docs(spark, [(1, "alpha beta\n\n  \ngamma")])
        segs = dedup.segment_documents(docs, segmenter="lines").collect()
        assert [(r.seg_idx, r.seg) for r in segs] == [
            (0, "alpha beta"),
            (1, "gamma"),
        ]

    def test_words_segmenter_fixed_windows_with_tail(self, spark):
        docs = _docs(spark, [(1, "a b c d e")])
        segs = dedup.segment_documents(
            docs, segmenter="words", words_per_segment=2
        ).collect()
        assert [(r.seg_idx, r.seg) for r in sorted(segs)] == [
            (0, "a b"),
            (1, "c d"),
            (2, "e"),
        ]

    def test_empty_text_yields_no_segments(self, spark):
        docs = _docs(spark, [(1, ""), (2, "   ")])
        for seg in ("lines", "words"):
            assert (
                dedup.segment_documents(docs, segmenter=seg).count() == 0
            )

    def test_unknown_segmenter_raises(self, spark):
        docs = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError, match="segmenter"):
            dedup.segment_documents(docs, segmenter="chars")


class TestLineDedup:
    def test_shared_line_cut_from_every_doc_no_keeper(self, spark):
        docs = _docs(
            spark,
            [
                (1, "subscribe to our newsletter\nunique one"),
                (2, "subscribe to our newsletter\nunique two"),
                (3, "all original here"),
            ],
        )
        out = {
            r.doc_id: r
            for r in dedup.line_dedup(docs, segmenter="lines").collect()
        }
        assert out[1].clean_text == "unique one"
        assert out[2].clean_text == "unique two"
        assert out[3].clean_text == "all original here"
        assert (out[1].n_removed, out[2].n_removed) == (1, 1)

    def test_within_doc_repetition_is_not_boilerplate(self, spark):
        docs = _docs(
            spark,
            [(1, "echo line\necho line\nbody"), (2, "other text")],
        )
        out = {
            r.doc_id: r
            for r in dedup.line_dedup(docs, segmenter="lines").collect()
        }
        # doc-frequency of "echo line" is 1 — both copies survive.
        assert out[1].clean_text == "echo line\necho line\nbody"
        assert out[1].n_removed == 0

    def test_fully_boilerplate_doc_comes_back_empty(self, spark):
        docs = _docs(
            spark,
            [(1, "cookie banner"), (2, "cookie banner"), (3, "real")],
        )
        out = {
            r.doc_id: r
            for r in dedup.line_dedup(docs, segmenter="lines").collect()
        }
        assert out[1].clean_text == "" and out[2].clean_text == ""
        assert out[1].n_segments == 1 and out[1].n_removed == 1
        assert out[3].clean_text == "real"

    def test_min_docs_threshold(self, spark):
        docs = _docs(
            spark,
            [(1, "shared\na"), (2, "shared\nb"), (3, "shared\nc")],
        )
        out2 = {
            r.doc_id: r.n_removed
            for r in dedup.line_dedup(
                docs, segmenter="lines", min_docs=2
            ).collect()
        }
        out4 = {
            r.doc_id: r.n_removed
            for r in dedup.line_dedup(
                docs, segmenter="lines", min_docs=4
            ).collect()
        }
        assert out2 == {1: 1, 2: 1, 3: 1}
        assert out4 == {1: 0, 2: 0, 3: 0}

    def test_words_segmenter_cuts_shared_window(self, spark):
        # 2-word windows: docs 1 and 2 share the window "x y" at
        # DIFFERENT positions — position-independent boilerplate.
        docs = _docs(
            spark,
            [(1, "x y a b"), (2, "c d x y"), (3, "e f g h")],
        )
        out = {
            r.doc_id: r
            for r in dedup.line_dedup(
                docs, segmenter="words", words_per_segment=2
            ).collect()
        }
        assert out[1].clean_text == "a b"
        assert out[2].clean_text == "c d"
        assert out[3].clean_text == "e f g h"

    def test_every_input_doc_present_including_empty(self, spark):
        docs = _docs(spark, [(1, ""), (2, "solo")])
        out = {
            r.doc_id: r
            for r in dedup.line_dedup(docs, segmenter="lines").collect()
        }
        assert set(out) == {1, 2}
        assert out[1].clean_text == "" and out[1].n_segments == 0

    def test_min_docs_below_two_raises(self, spark):
        docs = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError, match="min_docs"):
            dedup.line_dedup(docs, min_docs=1)


class TestKeepersByScore:
    def _run(self, spark, docs_rows, pair_rows):
        docs = spark.createDataFrame(docs_rows, "doc_id long, score long")
        pairs = spark.createDataFrame(
            pair_rows or [], "doc_a long, doc_b long"
        )
        return {
            r.doc_id: r.keeper_doc_id
            for r in dedup.neardup_keepers_by_score(
                docs, pairs, "score"
            ).collect()
        }

    def test_highest_score_wins_regardless_of_id_order(self, spark):
        got = self._run(
            spark,
            [(1, 10), (2, 99), (3, 5), (9, 0)],
            [(1, 2), (2, 3)],
        )
        assert got == {1: 2, 2: 2, 3: 2, 9: 9}

    def test_tie_breaks_to_min_id(self, spark):
        got = self._run(spark, [(4, 7), (8, 7)], [(4, 8)])
        assert got == {4: 4, 8: 4}

    def test_unpaired_docs_keep_themselves(self, spark):
        got = self._run(spark, [(1, 1), (2, 2)], [])
        assert got == {1: 1, 2: 2}

    def test_transitive_component_shares_one_keeper(self, spark):
        got = self._run(
            spark,
            [(1, 1), (2, 2), (3, 3), (4, 4)],
            [(1, 2), (3, 4), (2, 3)],
        )
        assert set(got.values()) == {4}


class TestSplitLeakage:
    def _report(self, spark, docs_rows, split_rows, span=4):
        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        plan = spark.createDataFrame(split_rows, "doc_id long, split string")
        return {
            r.split: r
            for r in dedup.split_leakage_report(
                docs, plan, span_tokens=span
            ).collect()
        }

    def test_shared_gram_marks_leaky(self, spark):
        shared = "alpha beta gamma delta"
        rows = [
            (1, f"{shared} train tail words"),
            (2, f"val head {shared}"),          # leaks via the 4-gram
            (3, "completely different val doc content"),
            (4, "yet another test doc body here"),
        ]
        split = [(1, "train"), (2, "val"), (3, "val"), (4, "test")]
        got = self._report(spark, rows, split)
        assert got["val"].n_docs == 2 and got["val"].n_leaky_docs == 1
        assert got["val"].leak_permille == 500
        assert got["test"].n_leaky_docs == 0
        assert got["test"].leak_permille == 0

    def test_short_doc_counts_but_cannot_leak(self, spark):
        rows = [(1, "a b c d e f"), (2, "a b")]  # doc 2 < span tokens
        split = [(1, "train"), (2, "val")]
        got = self._report(spark, rows, split)
        assert got["val"].n_docs == 1 and got["val"].n_leaky_docs == 0

    def test_val_val_overlap_is_not_leakage(self, spark):
        # two val docs sharing a gram absent from train: no leak
        shared = "p q r s"
        rows = [(1, "train only text here now"),
                (2, f"{shared} one"), (3, f"{shared} two")]
        split = [(1, "train"), (2, "val"), (3, "val")]
        got = self._report(spark, rows, split)
        assert got["val"].n_leaky_docs == 0
