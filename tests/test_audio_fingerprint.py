"""Perceptual audio fingerprints (multimodal.audio_fingerprints):
sign-of-delta energy codes + banded hamming retrieval, the audio twin
of the image dHash path."""

from __future__ import annotations

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    multimodal,
)


def _media(spark, texts, media_type="audio"):
    rows = [
        (i, media_type, t.encode(), len(t.encode()))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary, n_bytes int"
    )


class TestAudioFingerprint:
    def test_locality_and_discrimination(self, spark):
        base = " ".join(f"smp{i}" for i in range(60))
        edited = base.replace("smp7", "zzz", 1)  # one token swapped
        other = " ".join(f"far{i}" for i in range(60))
        media = _media(spark, [base, edited, other])
        h = {
            r["doc_id"]: r["afp"]
            for r in multimodal.audio_fingerprints(media).collect()
        }
        ham = lambda a, b: bin(h[a] ^ h[b]).count("1")
        # one token edit perturbs <= 2 energy windows -> <= 4 delta
        # bits (each touched window has two adjacent comparisons)
        assert ham(0, 1) <= 4
        assert ham(0, 2) > 4
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in multimodal.audio_fingerprint_pairs(
                media, max_hamming=4
            ).collect()
        }
        assert (0, 1) in pairs and (0, 2) not in pairs

    def test_banded_equals_bruteforce(self, spark, sf_dir):
        """Full-recall regime: the banded retrieval returns EXACTLY
        the quadratic hamming pair set over the corpus audio rows."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        media = multimodal.documents_as_media(docs)
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in multimodal.audio_fingerprint_pairs(
                media, max_hamming=1
            ).collect()
        }
        fps = sorted(
            (r["doc_id"], r["afp"])
            for r in multimodal.audio_fingerprints(media).collect()
        )
        brute = {
            (a_id, b_id, bin(a_h ^ b_h).count("1"))
            for i, (a_id, a_h) in enumerate(fps)
            for b_id, b_h in fps[i + 1 :]
            if bin(a_h ^ b_h).count("1") <= 1
        }
        assert got == brute

    def test_independent_of_image_grid(self, spark):
        """The audio hash family is salted ('|aud') — a payload's
        audio fingerprint is NOT a function of its image pixel
        histogram (different bucketing of the same tokens)."""
        text = " ".join(f"tok{i}" for i in range(40))
        a = _media(spark, [text], "audio")
        i = _media(spark, [text], "image")
        afp = multimodal.audio_fingerprints(a).collect()[0]["afp"]
        dh = multimodal.image_hashes(i).collect()[0]["dhash"]
        assert afp != dh

    def test_media_filter_and_range(self, spark):
        rows = [
            (0, "audio", b"a b c", 5),
            (1, "image", b"a b c", 5),  # filtered out
        ]
        media = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary, n_bytes int"
        )
        out = multimodal.audio_fingerprints(media).collect()
        assert [r["doc_id"] for r in out] == [0]
        assert 0 <= out[0]["afp"] < (1 << 63)

    def test_gain_invariance_of_real_path_shape(self):
        """Pure-python check of the sign-of-delta code: scaling every
        energy equally (gain) preserves all > relations, so the
        fingerprint is gain-invariant by construction."""
        en = [3, 1, 4, 1, 5, 9, 2, 6] * 8
        doubled = [e * 2 for e in en]
        assert multimodal._audio_fp_from_energies(
            en
        ) == multimodal._audio_fp_from_energies(doubled)

    def test_real_path_env_gated(self, spark):
        try:
            import soundfile  # noqa: F401

            pytest.skip("soundfile present: real path exercised there")
        except ImportError:
            pass
        media = _media(spark, ["some text"])
        with pytest.raises(NotImplementedError, match="soundfile"):
            multimodal.audio_fingerprints(media, fake=False)
