"""Multimodal (image/audio/video) column plumbing for the
training-data pipeline.

Media is carried as an opaque ``binary`` payload column plus a typed
metadata struct — the schema a 100 TB multimodal corpus uses (payload
stays columnar in parquet, metadata prunes without touching bytes).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested. Image decode and resize
have a REAL PIL implementation, env-gated: where PIL is absent (this
container) ``decode_media(..., fake=False)`` / ``resize_images`` raise
``NotImplementedError``; audio/video real decode would need
soundfile/pyav and stays gated. The deterministic fake codec derives
every output from md5 of the payload bytes, is the default, and gives
the operators exact DuckDB oracles.

The reference has no binary/media surface at all (SURVEY §2.12); this
module is part of the beyond-parity training-data pipeline alongside
``dedup``/``similarity``/``text_profile``.

Scale notes:
- ``mapInPandas`` transfers Arrow batches; tune
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large
  payloads so a batch stays within executor memory (10 MB images ×
  10k default batch rows would be 100 GB).
- Decode is embarrassingly parallel — no shuffle anywhere in this
  module; partition count follows the parquet input splits.
- Feature vectors come back as ``array<double>`` ready for
  ``operators.similarity`` (cosine top-k / near-dup on the fake
  features works today; swap the fake for a real encoder later).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image", "audio", "video"]

# (payload, metadata) schema for a media table. Metadata fields are
# nullable — only the ones relevant to the media_type are set.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("fp_long", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_HASH_SPACE = float(16**15)  # md5_long is a 60-bit (15 hex char) value


def documents_as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter: stand-in media table from the ``documents`` testdata.

    payload = utf-8 bytes of the text (a deterministic opaque blob);
    media_type cycles image/audio/video by doc_id. Real corpora read
    (payload, metadata) straight from parquet with MEDIA_SCHEMA.
    """
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def _md5_long_bytes(payload: bytes, salt: str = "") -> int:
    """Python twin of functions.text.md5_long: first 15 hex chars of
    md5(payload || salt) as a 60-bit int. Exactly reproducible in
    DuckDB as CAST('0x' || substr(md5(text || salt), 1, 15) AS BIGINT)
    when payload is the utf-8 encoding of text."""
    return int(hashlib.md5(payload + salt.encode()).hexdigest()[:15], 16)


def _fake_decode_row(media_type: str, payload: bytes) -> dict:
    """Deterministic fake codec: every metadata field is a pure
    function of the payload hash — stands in for PIL / soundfile /
    pyav until those are available."""
    h = _md5_long_bytes(payload)
    out = {"width": None, "height": None, "n_frames": None, "sample_rate": None,
           "fp_long": h}
    if media_type == "image":
        out["width"] = 64 + h % 1024
        out["height"] = 64 + (h // 1024) % 1024
    elif media_type == "audio":
        out["sample_rate"] = 16000
        out["n_frames"] = 1 + h % 100000
    else:  # video
        out["width"] = 64 + h % 1024
        out["height"] = 64 + (h // 1024) % 1024
        out["n_frames"] = 1 + h % 3600
    return out


def _real_decode_image(payload: bytes) -> dict:
    """Real image decode via PIL: width/height/frame count from the
    actual bytes; fingerprint stays the payload md5 so dedup
    downstream is codec-independent."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return {
            "width": int(img.width),
            "height": int(img.height),
            "n_frames": int(getattr(img, "n_frames", 1)),
            "sample_rate": None,
            "fp_long": _md5_long_bytes(payload),
        }


def _real_decode_audio(payload: bytes) -> dict:
    """Real audio decode via the optional ``soundfile`` package
    (libsndfile): frame count and sample rate from the container
    header — no sample data is materialized. Import-gated exactly
    like the PIL image path; raises ``NotImplementedError`` naming
    the missing package where it is absent (as in this container)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real audio decode needs the optional 'soundfile' package "
            "(pip install soundfile); not available — use fake=True"
        ) from exc
    import io

    import soundfile as sf

    info = sf.info(io.BytesIO(payload))
    return {
        "width": None,
        "height": None,
        "n_frames": int(info.frames),
        "sample_rate": int(info.samplerate),
        "fp_long": _md5_long_bytes(payload),
    }


def _real_decode_video(payload: bytes) -> dict:
    """Real video decode via the optional ``av`` package (PyAV/FFmpeg):
    dimensions from the first video stream's codec context, frame
    count from stream metadata with a decode-walk fallback for
    containers that omit it. Import-gated like PIL/soundfile."""
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real video decode needs the optional 'av' (PyAV) package "
            "(pip install av); not available — use fake=True"
        ) from exc
    import io

    import av as _av

    with _av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        n_frames = stream.frames
        if not n_frames:
            n_frames = sum(1 for _ in container.decode(stream))
        return {
            "width": int(stream.codec_context.width),
            "height": int(stream.codec_context.height),
            "n_frames": int(n_frames),
            "sample_rate": None,
            "fp_long": _md5_long_bytes(payload),
        }


_REAL_DECODERS = {
    "image": _real_decode_image,
    "audio": _real_decode_audio,
    "video": _real_decode_video,
}


def _real_decode_row(media_type: str, payload: bytes) -> dict:
    """Real codec dispatch: PIL for images, soundfile for audio, PyAV
    for video — each optional and import-gated independently, so a
    container with only PIL decodes image rows and raises a precise
    ``NotImplementedError`` (naming the missing package) on the
    first audio/video row instead of silently faking inside a "real"
    decode."""
    try:
        decoder = _REAL_DECODERS[media_type]
    except KeyError:
        raise NotImplementedError(
            f"no real decoder for media_type={media_type!r}: expected "
            f"one of {sorted(_REAL_DECODERS)}"
        ) from None
    return decoder(payload)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode: (payload, media_type) -> typed metadata.

    ``fake=False`` is the real-codec path: PIL for image rows,
    soundfile for audio rows, PyAV for video rows — each optional and
    import-gated independently (a container with only PIL decodes
    image rows; the first audio/video row raises a
    ``NotImplementedError`` naming the missing package). Where even
    PIL is absent (as in this container) the call raises up front.
    The fake path is deterministic (md5-derived) and oracle-checkable,
    and remains the default and the driver-contract surface.
    """
    if not fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real media decode needs at least PIL (plus soundfile "
                "for audio rows, av for video rows); not available in "
                "this container — use fake=True"
            ) from exc
    row_fn = _fake_decode_row if fake else _real_decode_row

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                row_fn(mt, bytes(pl))
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched fake feature extraction: payload -> dense
    ``array<double>`` in [0, 1), feature j = md5_long(payload||'|'||j)
    / 16^15. Swapping the hash for a real encoder changes only the
    inner loop; schema/batching/plumbing stay identical."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                [
                    _md5_long_bytes(bytes(pl), f"|{j}") / _HASH_SPACE
                    for j in range(dim)
                ]
                for pl in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "features": vecs,
                }
            )

    return media.mapInPandas(feats, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize via PIL (raises ``NotImplementedError`` where
    PIL is absent, as in this container). Image rows are decoded,
    resized to (width, height) and re-encoded as PNG; non-image rows
    pass through untouched — the same mixed-media-map shape as
    ``decode_media``. Output schema is MEDIA_SCHEMA (payload/n_bytes
    updated), so resize stages compose/chain like any other media op.
    No shuffle; embarrassingly parallel per Arrow batch."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "resize_images needs PIL; not available in this container"
        ) from exc

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            payloads: list[bytes] = []
            for mt, pl in zip(pdf["media_type"], pdf["payload"]):
                raw = bytes(pl)
                if mt != "image":
                    payloads.append(raw)
                    continue
                with Image.open(io.BytesIO(raw)) as img:
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format="PNG")
                    payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": payloads,
                    "n_bytes": pd.Series(
                        [len(b) for b in payloads], dtype="int32"
                    ),
                }
            )

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frame_indices(
    decoded: DataFrame, every_n: int = 30, max_frames: int = 16
) -> DataFrame:
    """Frame sampling for video rows — pure column expressions (no
    decode needed): pick frame indices 0, n, 2n, ... capped at
    ``max_frames``. Output one row per (doc_id, frame_index), the
    shape a downstream per-frame decode consumes."""
    return (
        decoded.filter(
            (F.col("media_type") == "video") & F.col("n_frames").isNotNull()
        )
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.slice(
                    F.sequence(
                        F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                    ),
                    1,
                    max_frames,
                )
            ).alias("frame_index"),
        )
    )
