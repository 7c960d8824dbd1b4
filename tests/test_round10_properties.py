"""Property tests for the round-10 wave-2 operators: randomized
inputs checked against pure-Python brute force (the unit tests pin
crafted cases; these sweep the input space)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    dedup,
    multimodal,
    text_profile,
)

# tiny alphabet -> segment collisions across docs, where the
# doc-frequency and reassembly logic actually get exercised
WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
)
CORPUS = st.lists(WORDS, min_size=1, max_size=6)


def _brute_line_dedup(texts, k, min_docs):
    segs = {
        i: [" ".join(ws[j : j + k]) for j in range(0, len(ws), k)]
        for i, ws in enumerate(texts)
    }
    df = {}
    for i, ss in segs.items():
        for s in set(ss):
            df[s] = df.get(s, 0) + 1
    boiler = {s for s, n in df.items() if n >= min_docs}
    out = {}
    for i, ss in segs.items():
        kept = [s for s in ss if s not in boiler]
        out[i] = (" ".join(kept), len(ss), len(ss) - len(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(CORPUS, st.integers(min_value=1, max_value=4),
       st.integers(min_value=2, max_value=3))
def test_line_dedup_matches_brute_force(spark, word_lists, k, min_docs):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_segments, r.n_removed)
        for r in dedup.line_dedup(
            docs, min_docs=min_docs, segmenter="words",
            words_per_segment=k,
        ).collect()
    }
    assert got == _brute_line_dedup(word_lists, k, min_docs)


@settings(max_examples=10, deadline=None)
@given(CORPUS, st.integers(min_value=1, max_value=4))
def test_segment_join_roundtrips_tokens(spark, word_lists, k):
    """array_join of a doc's word-window segments in order is exactly
    the whitespace-normalized token stream — segmentation loses
    nothing."""
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    segs = dedup.segment_documents(
        docs, segmenter="words", words_per_segment=k
    ).collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append((r.seg_idx, r.seg))
    for i, ws in enumerate(word_lists):
        joined = " ".join(s for _, s in sorted(by_doc.get(i, [])))
        assert joined == " ".join(ws)


@settings(max_examples=8, deadline=None)
@given(st.lists(WORDS, min_size=2, max_size=5),
       st.integers(min_value=1, max_value=3))
def test_video_jaccard_matches_brute_force(spark, word_lists, k):
    texts = [" ".join(ws) for ws in word_lists]
    rows = [
        (i, "video", t.encode(), len(t.encode()))
        for i, t in enumerate(texts)
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary, n_bytes int"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_shared, r.jaccard)
        for r in multimodal.video_framehash_pairs(
            media, frame_tokens=k, threshold=0.0
        ).collect()
    }
    frames = {
        i: {
            " ".join(ws[j : j + k])
            for j in range(0, len(ws), k)
        }
        for i, ws in enumerate(word_lists)
    }
    brute = {}
    ids = sorted(frames)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            inter = len(frames[ids[x]] & frames[ids[y]])
            if inter:
                union = len(frames[ids[x]] | frames[ids[y]])
                brute[(ids[x], ids[y])] = (inter, inter / union)
    assert got == brute


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100),
                min_size=1, max_size=25),
       st.sampled_from([100, 200, 500]))
def test_adaptive_keep_count_is_exact(spark, scores, drop_permille):
    """The kept count per group is EXACTLY n - (n*drop) div 1000, for
    any score multiset (ties included)."""
    rows = [(i, "G", s) for i, s in enumerate(scores)]
    scored = spark.createDataFrame(
        rows, "doc_id long, source string, score long"
    )
    kept = text_profile.adaptive_quality_keep(
        scored, "score", keep_fraction=1.0 - drop_permille / 1000
    ).count()
    n = len(scores)
    assert kept == n - (n * drop_permille) // 1000


def _brute_intradoc(texts, k):
    out = {}
    for i, ws in enumerate(texts):
        ss = [" ".join(ws[j : j + k]) for j in range(0, len(ws), k)]
        seen, kept = set(), []
        for s in ss:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[i] = (" ".join(kept), len(ss), len(ss) - len(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(CORPUS, st.integers(min_value=1, max_value=3))
def test_intradoc_dedup_matches_brute_force(spark, word_lists, k):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_segments, r.n_removed)
        for r in dedup.intradoc_dedup(
            docs, segmenter="words", words_per_segment=k
        ).collect()
    }
    assert got == _brute_intradoc(word_lists, k)


def _brute_c4(texts, k, min_w, min_lines):
    out = {}
    for i, ws in enumerate(texts):
        ss = [" ".join(ws[j : j + k]) for j in range(0, len(ws), k)]
        kept = [s for s in ss if len(s.split()) >= min_w]
        out[i] = (" ".join(kept), len(ss), len(kept), len(kept) >= min_lines)
    return out


@settings(max_examples=10, deadline=None)
@given(
    CORPUS,
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
)
def test_c4_clean_matches_brute_force(spark, word_lists, k, min_w, min_lines):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept_lines, bool(r.c4_ok))
        for r in text_profile.c4_clean(
            docs,
            segmenter="words",
            words_per_segment=k,
            min_words_per_line=min_w,
            min_lines=min_lines,
        ).collect()
    }
    assert got == _brute_c4(word_lists, k, min_w, min_lines)


PAIR_GRAPHS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(PAIR_GRAPHS)
def test_soft_weights_match_union_find(spark, edges):
    parent = list(range(8))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = {}
    for v in range(8):
        sizes[find(v)] = sizes.get(find(v), 0) + 1
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: (r.keeper_doc_id, r.group_size, r.weight_permille)
        for r in dedup.soft_dedup_weights(docs, pairs).collect()
    }
    want = {
        v: (find(v), sizes[find(v)], 1000 // sizes[find(v)])
        for v in range(8)
    }
    assert got == want


BANDS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=4,
)
PROBE = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-60, max_value=60)),
    st.one_of(st.none(), st.integers(min_value=-60, max_value=60)),
)


@settings(max_examples=8, deadline=None)
@given(BANDS, PROBE)
def test_zone_map_scan_equals_filter(spark, tmp_path_factory, bands, probe):
    """scan(ranges) must return exactly read().filter(ranges) for ANY
    batch layout and ANY probe — pruning can only skip units proven
    disjoint, never change the answer."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
        make_sink,
    )

    root = tmp_path_factory.mktemp("zm")
    sink = make_sink(
        spark,
        str(root),
        keys={"t": ["rid"]},
        backend="manifest",
        stats_cols={"t": ["k"]},
    )
    expect = {}
    next_id = 0
    for lo, width in bands:
        rows = [(next_id + i, lo + i) for i in range(width + 1)]
        next_id += len(rows)
        for rid, k in rows:
            expect[rid] = k
        sink.insert_if_absent(
            "t", spark.createDataFrame(rows, "rid long, k long")
        )
    qlo, qhi = probe
    got_df = sink.scan("t", {"k": (qlo, qhi)})
    got = (
        set()
        if got_df is None
        else {r["rid"] for r in got_df.collect()}
    )
    want = {
        rid
        for rid, k in expect.items()
        if (qlo is None or k >= qlo) and (qhi is None or k <= qhi)
    }
    assert got == want


EVOLUTION_BATCHES = st.lists(
    st.tuples(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),   # key
                st.integers(min_value=0, max_value=99),  # a-value
            ),
            min_size=1,
            max_size=4,
        ),
        st.sampled_from(["a", "ab", "b"]),  # optional-column subset
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None)
@given(EVOLUTION_BATCHES)
def test_schema_evolution_matches_dict_model(
    spark, tmp_path_factory, batches
):
    """Random add/omit batch sequences against a pure-Python model:
    first writer of a key wins, columns a batch omitted are NULL on
    its rows, columns added later are NULL on earlier rows — no batch
    order or column mix may break the insert-if-absent contract."""
    from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators.sinks import (
        make_sink,
    )

    root = tmp_path_factory.mktemp("sev")
    sink = make_sink(
        spark,
        str(root),
        keys={"t": ["k"]},
        backend="manifest",
        allow_schema_evolution=True,
    )
    model: dict[int, dict] = {}
    for rows, cols in batches:
        data, schema_parts = [], ["k long"]
        if "a" in cols:
            schema_parts.append("a long")
        if "b" in cols:
            schema_parts.append("b long")
        seen_in_batch = set()
        for key, val in rows:
            if key in seen_in_batch:
                continue  # within-batch dedup keeps the first row
            seen_in_batch.add(key)
            rec = [key]
            if "a" in cols:
                rec.append(val)
            if "b" in cols:
                rec.append(val * 2)
            data.append(tuple(rec))
            if key not in model:
                model[key] = {
                    "a": val if "a" in cols else None,
                    "b": val * 2 if "b" in cols else None,
                }
        sink.insert_if_absent(
            "t", spark.createDataFrame(data, ", ".join(schema_parts))
        )
    got = {}
    for r in sink.read("t").collect():
        d = r.asDict()
        got[d["k"]] = {
            "a": d.get("a"),
            "b": d.get("b"),
        }
    assert got == model
