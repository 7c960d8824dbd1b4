"""Multimodal binary-column plumbing: Arrow-batched mapInPandas decode
/ feature-extract, stub gating, frame sampling. The fake codec is
deterministic (md5-derived), so results are recomputable in pure
Python here and in DuckDB in test_pipeline_queries."""

from __future__ import annotations

import hashlib

import pytest

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.operators import (
    multimodal,
    similarity,
)
from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.sources.testdata import (
    table,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return multimodal.documents_as_media(table(spark, sf_dir, "documents"))


def _h(payload: bytes, salt: str = "") -> int:
    return int(hashlib.md5(payload + salt.encode()).hexdigest()[:15], 16)


def test_media_adapter_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "payload", "n_bytes",
    ]
    row = media.orderBy("doc_id").first()
    assert row.media_type == multimodal.MEDIA_TYPES[row.doc_id % 3]
    assert row.n_bytes == len(bytes(row.payload))


def test_fake_decode_matches_python(media):
    rows = {r.doc_id: r for r in multimodal.decode_media(media).collect()}
    src = {r.doc_id: r for r in media.collect()}
    assert rows.keys() == src.keys()
    for doc_id, r in list(rows.items())[:50]:
        payload = bytes(src[doc_id].payload)
        expected = multimodal._fake_decode_row(r.media_type, payload)
        assert r.fp_long == _h(payload)
        for k in ("width", "height", "n_frames", "sample_rate"):
            assert getattr(r, k) == expected[k], (doc_id, k)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="PIL present: real path active, gate moot"
)
def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media, fake=False)
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(media, 64, 64)


@pytest.mark.skipif(not _pil_available(), reason="needs PIL")
def test_real_decode_reads_actual_dimensions(spark):
    import io

    from PIL import Image

    def png(w, h):
        img = Image.new("RGB", (w, h), (120, 40, 200))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [(0, "image", png(10, 6), None), (1, "image", png(33, 21), None)],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r.doc_id: r
        for r in multimodal.decode_media(media, fake=False).collect()
    }
    assert (got[0].width, got[0].height) == (10, 6)
    assert (got[1].width, got[1].height) == (33, 21)
    assert got[0].n_frames == 1 and got[0].sample_rate is None


@pytest.mark.skipif(not _pil_available(), reason="needs PIL")
def test_real_resize_roundtrip_and_passthrough(spark):
    import io

    from PIL import Image

    def png(w, h):
        img = Image.new("RGB", (w, h), (5, 5, 5))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    audio = b"\x00\x01opaque-audio"
    media = spark.createDataFrame(
        [(0, "image", png(40, 40), None), (1, "audio", audio, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_images(media, 8, 8)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in multimodal.MEDIA_SCHEMA.fields
    ]
    got = {r.doc_id: r for r in out.collect()}
    # resized image really is 8x8 when decoded again
    re_dec = {
        r.doc_id: r
        for r in multimodal.decode_media(
            out.filter("media_type = 'image'"), fake=False
        ).collect()
    }
    assert (re_dec[0].width, re_dec[0].height) == (8, 8)
    assert got[0].n_bytes == len(bytes(got[0].payload))
    # non-image payloads pass through byte-identical
    assert bytes(got[1].payload) == audio


@pytest.mark.skipif(not _pil_available(), reason="needs PIL")
def test_real_decode_rejects_nonimage_rows(spark):
    media = spark.createDataFrame(
        [(0, "audio", b"\x00\x01", None)], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        multimodal.decode_media(media, fake=False).collect()


def test_feature_extraction_shape_and_values(media):
    feats = multimodal.extract_features(media, dim=multimodal.FEATURE_DIM)
    rows = feats.orderBy("doc_id").limit(20).collect()
    src = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for r in rows:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.features)
        expected0 = _h(src[r.doc_id], "|0") / float(16**15)
        assert r.features[0] == expected0


def test_frame_sampling_caps_and_stride(spark, sf_dir, media):
    decoded = multimodal.decode_media(media)
    frames = multimodal.sample_frame_indices(decoded, every_n=30, max_frames=16)
    pdf = frames.toPandas()
    assert (pdf["frame_index"] % 30 == 0).all()
    per_doc = pdf.groupby("doc_id").agg(
        n=("frame_index", "size"), mx=("frame_index", "max"),
        nf=("n_frames", "first"),
    )
    assert (per_doc["n"] <= 16).all()
    assert (per_doc["mx"] < per_doc["nf"]).all()
    # only video rows sampled
    assert set(pdf["doc_id"] % 3) == {2}


def test_fake_features_feed_similarity(spark, sf_dir, media):
    """Features compose with the ANN operator: array<double> renamed to
    the embedding contract runs through cosine_topk unchanged."""
    feats = (
        multimodal.extract_features(media)
        .selectExpr("doc_id as vec_id", "features as embedding")
        .limit(50)
    )
    out = similarity.cosine_topk(feats, num_queries=2, k=3)
    rows = out.collect()
    assert {r.query_id for r in rows} <= {0, 1}
    assert all(1 <= r.rank <= 3 for r in rows)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_real_audio_video_error_contracts():
    # runnable without any codec: each missing optional package is
    # named precisely, per media type
    with pytest.raises(NotImplementedError, match="soundfile"):
        multimodal._real_decode_audio(b"RIFF....WAVE")
    with pytest.raises(NotImplementedError, match="'av'"):
        multimodal._real_decode_video(b"\x00\x00\x00 ftypisom")
    with pytest.raises(NotImplementedError, match="no real decoder"):
        multimodal._real_decode_row("hologram", b"x")


def _wav_bytes(n_frames=160, rate=8000):
    """Minimal valid PCM16 mono WAV, no audio libs needed."""
    import struct

    data = struct.pack(f"<{n_frames}h", *([0] * n_frames))
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def test_real_audio_decode_reads_header():
    pytest.importorskip("soundfile")
    got = multimodal._real_decode_audio(_wav_bytes(160, 8000))
    assert got["n_frames"] == 160 and got["sample_rate"] == 8000
    assert got["width"] is None and got["height"] is None
    assert got["fp_long"] == multimodal._md5_long_bytes(_wav_bytes(160, 8000))


def test_real_video_decode_reads_stream():
    av = pytest.importorskip("av")
    import io

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 32, 16
        stream.pix_fmt = "yuv420p"
        import numpy as np

        for _ in range(5):
            frame = av.VideoFrame.from_ndarray(
                np.zeros((16, 32, 3), dtype=np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                out.mux(packet)
        for packet in stream.encode():
            out.mux(packet)
    got = multimodal._real_decode_video(buf.getvalue())
    assert (got["width"], got["height"]) == (32, 16)
    assert got["n_frames"] == 5
