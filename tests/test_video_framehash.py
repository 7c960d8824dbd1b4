"""Video frame-hash dedup (multimodal.video_frame_hashes /
video_framehash_pairs): per-frame perceptual ids, set-Jaccard pairs
via the inverted frame index."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    multimodal,
)


def _media(spark, texts, media_type="video"):
    rows = [
        (i, media_type, t.encode(), len(t.encode()))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary, n_bytes int"
    )


def _vid_text(frames):
    """Build a payload whose 2-token windows are exactly ``frames``
    (each frame a 2-token string)."""
    return " ".join(frames)


class TestVideoFrameHashes:
    def test_frame_decomposition_and_locality(self, spark):
        # identical leading windows -> identical frame hashes at the
        # same indices; an edit in one window changes only that frame
        base = ["a b", "c d", "e f"]
        edit = ["a b", "XX d", "e f"]
        media = _media(
            spark, [_vid_text(base), _vid_text(edit)]
        )
        fh = multimodal.video_frame_hashes(media, frame_tokens=2)
        rows = {(r.doc_id, r.frame_idx): r.frame_hash for r in fh.collect()}
        assert rows[(0, 0)] == rows[(1, 0)]
        assert rows[(0, 2)] == rows[(1, 2)]
        assert rows[(0, 1)] != rows[(1, 1)]

    def test_tail_window_and_empty_payload(self, spark):
        media = _media(spark, ["a b c", ""])
        fh = multimodal.video_frame_hashes(media, frame_tokens=2).collect()
        by_doc = {}
        for r in fh:
            by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        assert sorted(by_doc[0]) == [0, 1]  # "a b" + tail "c"
        assert 1 not in by_doc  # empty payload -> no frames

    def test_media_filter(self, spark):
        rows = [
            (0, "video", b"a b", 3),
            (1, "image", b"a b", 3),
        ]
        media = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary, n_bytes int"
        )
        out = multimodal.video_frame_hashes(media).collect()
        assert {r.doc_id for r in out} == {0}


class TestVideoFramehashPairs:
    def test_jaccard_exact_and_order_free(self, spark):
        # doc0: frames {A,B,C,D}; doc1: same frames re-cut (reversed
        # order) -> jaccard 1.0; doc2: shares {A,B} -> 2/4... doc2 has
        # frames {A,B,X,Y} -> inter 2, union 6 -> 1/3
        A, B, C, D = "a1 a2", "b1 b2", "c1 c2", "d1 d2"
        X, Y = "x1 x2", "y1 y2"
        media = _media(
            spark,
            [
                _vid_text([A, B, C, D]),
                _vid_text([D, C, B, A]),
                _vid_text([A, B, X, Y]),
            ],
        )
        got = {
            (r.doc_a, r.doc_b): (r.n_shared, r.jaccard)
            for r in multimodal.video_framehash_pairs(
                media, frame_tokens=2, threshold=0.0
            ).collect()
        }
        assert got[(0, 1)] == (4, 1.0)
        assert got[(0, 2)][0] == 2 and abs(got[(0, 2)][1] - 1 / 3) < 1e-15
        assert got[(1, 2)][0] == 2

    def test_threshold_filters(self, spark):
        A, B = "a1 a2", "b1 b2"
        media = _media(
            spark,
            [_vid_text([A, B]), _vid_text([A, "q1 q2"]), _vid_text([A, B])],
        )
        got = {
            (r.doc_a, r.doc_b)
            for r in multimodal.video_framehash_pairs(
                media, frame_tokens=2, threshold=0.9
            ).collect()
        }
        assert got == {(0, 2)}

    def test_duplicate_frames_count_once(self, spark):
        # within-video repeated frame dedups into the SET: doc0 has
        # {A} (A repeated 3x), doc1 has {A} -> jaccard 1.0
        A = "a1 a2"
        media = _media(spark, [_vid_text([A, A, A]), _vid_text([A])])
        got = multimodal.video_framehash_pairs(
            media, frame_tokens=2, threshold=0.5
        ).collect()
        assert len(got) == 1
        assert got[0].n_shared == 1 and got[0].jaccard == 1.0

    def test_hot_frame_cap_is_lower_bound(self, spark):
        # frame H appears in every video (a "black frame"); with
        # max_doc_freq=2 it leaves the index, so intersections shrink
        # but set sizes keep counting it -> jaccard under-estimates,
        # never over
        H, A, B = "h1 h2", "a1 a2", "b1 b2"
        media = _media(
            spark,
            [_vid_text([H, A, B]), _vid_text([H, A, B]), _vid_text([H])],
        )
        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in multimodal.video_framehash_pairs(
                media, frame_tokens=2, threshold=0.0
            ).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in multimodal.video_framehash_pairs(
                media, frame_tokens=2, threshold=0.0, max_doc_freq=2
            ).collect()
        }
        assert exact[(0, 1)] == 1.0
        assert capped[(0, 1)] == pytest.approx(2 / 4)  # H dropped
        assert all(capped[k] <= exact[k] for k in capped)
        # pairs connected ONLY through the hot frame disappear
        assert (0, 2) in exact and (0, 2) not in capped

    def test_real_path_env_gated(self, spark):
        try:
            import av  # noqa: F401

            pytest.skip("PyAV present: real path exercised there")
        except ImportError:
            pass
        media = _media(spark, ["some text"])
        with pytest.raises(NotImplementedError, match="av"):
            multimodal.video_frame_hashes(media, fake=False)


class TestMediaDedupKeepers:
    def test_components_stay_within_modality(self, spark):
        text_a = " ".join(f"w{i}" for i in range(40))
        rows = [
            (0, "image", text_a.encode(), 1),
            (3, "image", text_a.encode(), 1),   # image clone of 0
            (1, "audio", text_a.encode(), 1),
            (4, "audio", text_a.encode(), 1),   # audio clone of 1
            (2, "video", text_a.encode(), 1),   # no video partner
        ]
        media = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary, n_bytes int"
        )
        got = {
            r.doc_id: (r.media_type, r.keeper_doc_id)
            for r in multimodal.media_neardup_keepers(media).collect()
        }
        # identical payloads pair within image and within audio; the
        # modality scoping keeps the groups separate even though the
        # payload bytes are identical across them
        assert got[0] == ("image", 0) and got[3] == ("image", 0)
        assert got[1] == ("audio", 1) and got[4] == ("audio", 1)
        assert got[2] == ("video", 2)  # unpaired keeps itself
        assert len(got) == 5
