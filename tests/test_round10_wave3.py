"""Round-10 wave-3 operators: within-doc repeated-segment removal
(dedup.intradoc_dedup), soft dedup weights (dedup.soft_dedup_weights),
and the C4 cleaning rules (text_profile.c4_clean).

The contract rows pin these against DuckDB on the word-salad corpus;
these tests pin the semantics the corpus cannot exercise (newline
lines, terminal punctuation, blocklist, lorem/brace gates, constructed
components)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    dedup,
    text_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- intradoc


class TestIntradocDedup:
    def test_keeps_first_occurrence_only(self, spark):
        out = dedup.intradoc_dedup(
            _docs(spark, [(1, "dup line\nunique one\ndup line\ndup line")]),
            segmenter="lines",
        ).first()
        assert out["clean_text"] == "dup line\nunique one"
        assert out["n_segments"] == 4
        assert out["n_removed"] == 2

    def test_doc_without_repeats_is_identity(self, spark):
        out = dedup.intradoc_dedup(
            _docs(spark, [(1, "alpha beta\ngamma delta")]), segmenter="lines"
        ).first()
        assert out["clean_text"] == "alpha beta\ngamma delta"
        assert out["n_removed"] == 0

    def test_repeats_across_docs_untouched(self, spark):
        # The SAME line in two DIFFERENT docs is not intra-doc
        # repetition — both keep it (contrast line_dedup, which cuts
        # cross-doc boilerplate from every doc).
        out = {
            r["doc_id"]: r["clean_text"]
            for r in dedup.intradoc_dedup(
                _docs(spark, [(1, "shared line"), (2, "shared line")]),
                segmenter="lines",
            ).collect()
        }
        assert out == {1: "shared line", 2: "shared line"}

    def test_words_segmenter_windows(self, spark):
        # 2-word windows: "a b a b c d" -> ["a b", "a b", "c d"]:
        # second "a b" cut, order preserved.
        out = dedup.intradoc_dedup(
            _docs(spark, [(1, "a b a b c d")]),
            segmenter="words",
            words_per_segment=2,
        ).first()
        assert out["clean_text"] == "a b c d"
        assert out["n_segments"] == 3
        assert out["n_removed"] == 1

    def test_empty_doc_round_trips(self, spark):
        out = dedup.intradoc_dedup(
            _docs(spark, [(1, "")]), segmenter="words", words_per_segment=2
        ).first()
        assert out["clean_text"] == ""
        assert out["n_segments"] == 0
        assert out["n_removed"] == 0


# ------------------------------------------------------------ soft weights


class TestSoftDedupWeights:
    def test_component_sizes_and_weights(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(1, 7)], "doc_id long"
        )
        # {1,2,3} via transitive pair chain, {4,5}, {6} singleton.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
        )
        rows = {
            r["doc_id"]: r
            for r in dedup.soft_dedup_weights(docs, pairs).collect()
        }
        assert [rows[i]["keeper_doc_id"] for i in range(1, 7)] == [
            1, 1, 1, 4, 4, 6,
        ]
        assert [rows[i]["group_size"] for i in range(1, 7)] == [
            3, 3, 3, 2, 2, 1,
        ]
        assert rows[1]["weight_permille"] == 333  # 1000 div 3
        assert rows[4]["weight_permille"] == 500
        assert rows[6]["weight_permille"] == 1000

    def test_scale_parameter(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        out = dedup.soft_dedup_weights(docs, pairs, scale=100).collect()
        assert {r["weight_permille"] for r in out} == {50}

    def test_rejects_bad_scale(self, spark):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        try:
            dedup.soft_dedup_weights(docs, pairs, scale=0)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


# --------------------------------------------------------------------- C4


class TestC4Clean:
    def test_line_filter_min_words(self, spark):
        out = text_profile.c4_clean(
            _docs(
                spark,
                [(1, "one two three words here.\ntoo short\nthis line also survives fine.")],
            ),
            min_words_per_line=3,
            min_lines=2,
        ).first()
        assert out["clean_text"] == (
            "one two three words here.\nthis line also survives fine."
        )
        assert out["n_lines"] == 3
        assert out["n_kept_lines"] == 2
        assert bool(out["lines_ok"]) and bool(out["c4_ok"])

    def test_terminal_punctuation_rule(self, spark):
        out = text_profile.c4_clean(
            _docs(spark, [(1, "a proper sentence ends here.\nno terminal punctuation line\nis it a question?")]),
            min_words_per_line=3,
            min_lines=1,
            require_terminal=True,
        ).first()
        assert out["clean_text"] == (
            "a proper sentence ends here.\nis it a question?"
        )

    def test_min_lines_gate(self, spark):
        out = text_profile.c4_clean(
            _docs(spark, [(1, "only one surviving line here.")]),
            min_lines=3,
        ).first()
        assert not bool(out["lines_ok"])
        assert not bool(out["c4_ok"])
        # the cleaned text is still reported (audit trail)
        assert out["clean_text"] == "only one surviving line here."

    def test_brace_and_lorem_gates(self, spark):
        rows = {
            r["doc_id"]: r
            for r in text_profile.c4_clean(
                _docs(
                    spark,
                    [
                        (1, "function f() { return 1 } and words."),
                        (2, "Lorem Ipsum dolor sit amet filler text."),
                        (3, "a perfectly clean page of text."),
                    ],
                ),
                min_lines=1,
            ).collect()
        }
        assert not bool(rows[1]["brace_ok"])
        assert not bool(rows[2]["lorem_ok"])  # case-insensitive
        assert bool(rows[3]["c4_ok"])
        assert not bool(rows[1]["c4_ok"]) and not bool(rows[2]["c4_ok"])

    def test_blocklist_gate(self, spark):
        rows = {
            r["doc_id"]: r
            for r in text_profile.c4_clean(
                _docs(
                    spark,
                    [(1, "this page mentions badword once."),
                     (2, "this page is fine.")],
                ),
                min_lines=1,
                blocklist=["BADWORD"],  # matching is case-folded
            ).collect()
        }
        assert not bool(rows[1]["blocklist_ok"])
        assert bool(rows[2]["blocklist_ok"])

    def test_zero_shuffle_plan(self, spark):
        # C4 is a pure projection: the physical plan must contain no
        # Exchange — the gate runs at 100 TB as a narrow map.
        df = text_profile.c4_clean(
            _docs(spark, [(1, "some text here.")]), min_lines=1
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestWave3PlanShape:
    def test_intradoc_no_window_no_sort(self, spark):
        # keep-first must compile to hash aggregates (min-of-struct),
        # never a Window or global Sort — the 100 TB plan shape.
        df = dedup.intradoc_dedup(
            _docs(spark, [(1, "a b a b"), (2, "c d")]),
            segmenter="words",
            words_per_segment=2,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "CartesianProduct" not in plan

    def test_soft_weights_no_cartesian(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
        pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
        df = dedup.soft_dedup_weights(docs, pairs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
