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


# Perceptual-hash grid: PHASH_ROWS × PHASH_COLS integer "pixels".
# dHash compares horizontal neighbours -> ROWS × (COLS-1) = 63 bits,
# deliberately 63 (not the classic 64) so the fingerprint stays a
# non-negative signed long and the banded hamming retrieval's div/mod
# band decomposition (dedup.hamming_near_pairs) works unchanged.
PHASH_ROWS = 7
PHASH_COLS = 10
PHASH_BITS = PHASH_ROWS * (PHASH_COLS - 1)  # 63


def _fake_pixels(payload: bytes) -> list[int]:
    """Deterministic codec-free pixel grid: a bag-of-features
    histogram — the payload splits into space-delimited tokens, each
    token hashes to one of ROWS×COLS buckets (md5 60-bit prefix mod
    n_pixels, the same hash family as ``functions.text.md5_long``),
    and pixel k is the count of tokens in bucket k, mod 256. LOCALITY
    AND SHIFT-INVARIANCE are the point — editing a few tokens perturbs
    only their buckets (an avalanche hash of the whole payload flips
    everything; contiguous-chunk sums break under any insertion that
    shifts chunk boundaries), so near-identical payloads land at small
    hamming distance. Exactly reproducible in SQL over ASCII text
    payloads, which is what gives the dhash rows their DuckDB
    oracle."""
    n_px = PHASH_ROWS * PHASH_COLS
    px = [0] * n_px
    for tok in payload.split(b" "):
        b = int(hashlib.md5(tok).hexdigest()[:15], 16) % n_px
        px[b] = (px[b] + 1) % 256
    return px


def _real_pixels(payload: bytes) -> list[int]:
    """Real perceptual grid via PIL: decode, grayscale, resize to
    COLS×ROWS (the canonical dHash pipeline). Env-gated like every
    real codec path here."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        small = img.convert("L").resize(
            (PHASH_COLS, PHASH_ROWS), Image.LANCZOS
        )
        return list(small.getdata())


def _dhash_from_pixels(px: list[int]) -> int:
    """Row-gradient bits: bit r*(COLS-1)+c set iff px[r][c] > px[r][c+1]."""
    out = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS - 1):
            if px[r * PHASH_COLS + c] > px[r * PHASH_COLS + c + 1]:
                out |= 1 << (r * (PHASH_COLS - 1) + c)
    return out


def _ahash_from_pixels(px: list[int]) -> int:
    """Mean bits over the first 63 pixels: bit k set iff
    px[k] * n_pixels > sum(px) — integer cross-multiplied so the mean
    comparison is exact in both engines (no float mean)."""
    total = sum(px)
    n_px = len(px)
    out = 0
    for k in range(PHASH_BITS):
        if px[k] * n_px > total:
            out |= 1 << k
    return out


def image_hashes(media: DataFrame, fake: bool = True) -> DataFrame:
    """Perceptual image hashes for the image rows of a media table:
    (doc_id, n_bytes, dhash, ahash), 63-bit integers.

    dHash (row-gradient bits) and aHash (above-mean bits) are the
    standard cheap perceptual fingerprints for image dedup in
    multimodal training sets — robust to small local edits, unlike
    the exact payload md5 (``decode_media``'s fp_long), which any
    single-byte change avalanches. ``fake=True`` (default, the
    contract surface) derives the pixel grid codec-free from the
    payload bytes (``_fake_pixels`` — deterministic, oracle-exact);
    ``fake=False`` decodes via PIL (grayscale + LANCZOS resize, the
    canonical pipeline), env-gated like ``resize_images``. Non-image
    rows are filtered out up front so no decode is attempted on them.

    One Arrow ``mapInPandas`` pass, embarrassingly parallel, no
    shuffle; the hamming-banded pair retrieval composes downstream
    (``image_dhash_pairs``)."""
    if not fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image hashing needs PIL; not available in this "
                "container — use fake=True"
            ) from exc
    px_fn = _fake_pixels if fake else _real_pixels

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [px_fn(bytes(pl)) for pl in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "dhash": [_dhash_from_pixels(p) for p in px],
                    "ahash": [_ahash_from_pixels(p) for p in px],
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        hashes,
        schema="doc_id long, n_bytes int, dhash long, ahash long",
    )


def image_dhash_pairs(
    media: DataFrame,
    bands: int = 7,
    max_hamming: int = 6,
    fake: bool = True,
) -> DataFrame:
    """Perceptual image near-dup pairs: dHash fingerprints, then the
    SAME banded hamming retrieval the text SimHash path uses
    (``dedup.hamming_near_pairs``) — band bucketing, key-bounded
    bucket self-join, exact bit_count verify. Defaults (7 bands of
    9 bits, max_hamming 6 = bands-1) keep the pigeonhole FULL-recall
    regime: the banded result is exactly the quadratic
    ``bit_count(xor) <= 6`` pair set, at bucket-join cost."""
    from .dedup import hamming_near_pairs

    fps = image_hashes(media, fake=fake).select("doc_id", "dhash")
    return hamming_near_pairs(
        fps.localCheckpoint(eager=False),
        "dhash",
        PHASH_BITS,
        bands,
        max_hamming,
    )


# Audio fingerprint grid: AHASH_WINDOWS sequential energy windows;
# the fingerprint is the 63 time-delta sign bits between adjacent
# windows — a Chromaprint-style sign-of-derivative code, and exactly
# the dHash construction over a 1×64 grid (kept 63-bit for the same
# signed-long / banded-hamming reasons as PHASH_BITS).
AUDIO_WINDOWS = 64
AUDIO_BITS = AUDIO_WINDOWS - 1  # 63


def _fake_audio_energies(payload: bytes) -> list[int]:
    """Deterministic codec-free energy profile: tokens of the payload
    hash to one of AUDIO_WINDOWS sequential windows (md5 60-bit prefix
    mod windows, salted so the audio surface is independent of the
    image pixel grid), window energy = token count mod 256. Same
    locality/shift-invariance argument as ``_fake_pixels``: a small
    payload edit perturbs few windows, so near-identical payloads land
    at small hamming distance. Exactly reproducible in SQL over ASCII
    payloads (the audio rows' DuckDB oracle)."""
    en = [0] * AUDIO_WINDOWS
    for tok in payload.split(b" "):
        b = int(
            hashlib.md5(tok + b"|aud").hexdigest()[:15], 16
        ) % AUDIO_WINDOWS
        en[b] = (en[b] + 1) % 256
    return en


def _real_audio_energies(payload: bytes) -> list[int]:
    """Real energy profile via soundfile: decode, split samples into
    AUDIO_WINDOWS equal windows, mean |amplitude| per window quantized
    to 0..255. Env-gated like every real codec path here."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real audio fingerprinting needs the optional 'soundfile' "
            "package; not available — use fake=True"
        ) from exc
    import io

    import numpy as np
    import soundfile as sf

    data, _rate = sf.read(io.BytesIO(payload), always_2d=True)
    mono = np.abs(data).mean(axis=1)
    if mono.size == 0:
        return [0] * AUDIO_WINDOWS
    chunks = np.array_split(mono, AUDIO_WINDOWS)
    return [
        int(min(255, round(float(c.mean() if c.size else 0.0) * 255)))
        for c in chunks
    ]


def _audio_fp_from_energies(en: list[int]) -> int:
    """Sign-of-delta bits: bit w set iff en[w] > en[w+1]."""
    out = 0
    for w in range(AUDIO_BITS):
        if en[w] > en[w + 1]:
            out |= 1 << w
    return out


def audio_fingerprints(media: DataFrame, fake: bool = True) -> DataFrame:
    """Perceptual audio fingerprints for the audio rows of a media
    table: (doc_id, n_bytes, afp) with afp a 63-bit sign-of-delta
    energy code (the Chromaprint/shazam-family shape: robust to gain
    and small local edits, unlike the payload md5 which any one-byte
    change avalanches). ``fake=True`` (default, the contract surface)
    derives the energy windows codec-free (``_fake_audio_energies``,
    oracle-exact); ``fake=False`` decodes via soundfile, env-gated.
    One Arrow ``mapInPandas`` pass, no shuffle; pairs compose through
    ``audio_fingerprint_pairs``."""
    if not fake:
        try:
            import soundfile  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real audio fingerprinting needs the optional "
                "'soundfile' package; not available — use fake=True"
            ) from exc
    en_fn = _fake_audio_energies if fake else _real_audio_energies

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "afp": [
                        _audio_fp_from_energies(en_fn(bytes(pl)))
                        for pl in pdf["payload"]
                    ],
                }
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        fps, schema="doc_id long, n_bytes int, afp long"
    )


def audio_fingerprint_pairs(
    media: DataFrame,
    bands: int = 7,
    max_hamming: int = 6,
    fake: bool = True,
) -> DataFrame:
    """Perceptual audio near-dup pairs: sign-of-delta fingerprints
    through the SAME banded hamming retrieval as the image/simhash
    paths (``dedup.hamming_near_pairs``). Defaults stay in the
    pigeonhole full-recall regime (max_hamming <= bands-1), so the
    banded result equals the exact quadratic hamming filter."""
    from .dedup import hamming_near_pairs

    fps = audio_fingerprints(media, fake=fake).select("doc_id", "afp")
    return hamming_near_pairs(
        fps.localCheckpoint(eager=False),
        "afp",
        AUDIO_BITS,
        bands,
        max_hamming,
    )


# Video fingerprint unit: consecutive VIDEO_FRAME_TOKENS-token windows
# of the payload stand in for decoded frames (fake path); each window
# hashes to one 60-bit frame id. Videos compare as SETS of frame ids
# (order-free Jaccard — robust to re-cuts and trims, the standard
# video-dedup shape: per-frame perceptual hash, set overlap).
VIDEO_FRAME_TOKENS = 8


def video_frame_hashes(
    media: DataFrame, frame_tokens: int = VIDEO_FRAME_TOKENS,
    fake: bool = True,
) -> DataFrame:
    """(doc_id, frame_idx, frame_hash) for the video rows of a media
    table — one 60-bit perceptual id per frame. ``fake=True``
    (default, the contract surface): frames are consecutive
    ``frame_tokens``-token windows of the payload, frame id =
    md5_long(window || '|vid') — LOCAL (editing one region of the
    payload changes only its frames) and exactly reproducible in SQL.
    ``fake=False`` decodes via PyAV and dHashes each frame
    (grayscale + LANCZOS to the PHASH grid), env-gated like every
    real codec path. One Arrow ``mapInPandas`` pass, no shuffle."""
    if not fake:
        try:
            import av  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real video frame hashing needs the optional 'av' "
                "(PyAV) package; not available — use fake=True"
            ) from exc
    if frame_tokens < 1:
        raise ValueError(f"frame_tokens ({frame_tokens}) must be >= 1")

    def fake_rows(pl: bytes) -> list[int]:
        toks = pl.split(b" ") if pl.strip() else []
        return [
            _md5_long_bytes(
                b" ".join(toks[i : i + frame_tokens]), "|vid"
            )
            for i in range(0, len(toks), frame_tokens)
        ]

    def real_rows(pl: bytes) -> list[int]:  # pragma: no cover - env-gated
        import io

        import av as _av
        from PIL import Image

        out = []
        with _av.open(io.BytesIO(pl)) as container:
            for frame in container.decode(video=0):
                img = frame.to_image().convert("L").resize(
                    (PHASH_COLS, PHASH_ROWS), Image.LANCZOS
                )
                out.append(_dhash_from_pixels(list(img.getdata())))
        return out

    row_fn = fake_rows if fake else real_rows

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fhs = [], [], []
            for did, pl in zip(pdf["doc_id"], pdf["payload"]):
                for i, fh in enumerate(row_fn(bytes(pl))):
                    ids.append(did)
                    idxs.append(i)
                    fhs.append(fh)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": fhs},
                columns=["doc_id", "frame_idx", "frame_hash"],
            ).astype(
                {"doc_id": "int64", "frame_idx": "int32",
                 "frame_hash": "int64"}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        hashes, schema="doc_id long, frame_idx int, frame_hash long"
    )


def video_framehash_pairs(
    media: DataFrame,
    frame_tokens: int = VIDEO_FRAME_TOKENS,
    threshold: float = 0.5,
    fake: bool = True,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Video near-dup pairs: Jaccard over each video's SET of frame
    hashes (doc_a < doc_b, jaccard >= threshold). Candidates come from
    the inverted frame-hash index (one self-equi-join on the 60-bit
    id) — only videos sharing at least one frame are ever compared,
    never all pairs; set sizes attach as two broadcast-sized joins.

    ``max_doc_freq``: at corpus scale a degenerate frame (black/intro
    card) shared by millions of videos would square the candidate
    list; dropping frame ids with doc_freq > max_doc_freq bounds the
    join fan-out. Dropped frames shrink INTERSECTIONS only — both
    sides' set sizes keep counting them — so reported jaccard is a
    LOWER bound (recall dial, precision intact). None (default) is
    the exact small-SF mode the oracle pins."""
    fh = (
        video_frame_hashes(media, frame_tokens, fake)
        .select("doc_id", "frame_hash")
        .distinct()
    )
    fh = fh.localCheckpoint(eager=False)
    sizes = fh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joinable = fh
    if max_doc_freq is not None:
        hot = (
            fh.groupBy("frame_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("frame_hash")
        )
        joinable = fh.join(hot, "frame_hash", "left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.frame_hash") == F.col("b.frame_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        F.col("n_shared")
        / (F.col("sa.n") + F.col("sb.n") - F.col("n_shared"))
    ).cast("double")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def media_neardup_keepers(
    media: DataFrame,
    image_max_hamming: int = 6,
    audio_max_hamming: int = 6,
    video_threshold: float = 0.5,
    fake: bool = True,
) -> DataFrame:
    """One keeper assignment across the WHOLE media table: each
    modality's perceptual near-dup pairs (image dHash hamming, audio
    sign-of-delta hamming, video frame-set Jaccard) union into one
    edge relation, connected components assign one keeper per
    near-dup group, rows in no pair keep themselves — the media-table
    twin of the text pipeline's ``dedup.neardup_keepers``, and the
    dedup pass a multimodal training set runs before packing.

    Modalities never cross-pair (each retrieval is scoped to its
    media_type rows), so components stay within a modality by
    construction. Returns (doc_id, media_type, keeper_doc_id)."""
    from .dedup import neardup_keepers

    pairs = (
        image_dhash_pairs(media, max_hamming=image_max_hamming, fake=fake)
        .select("doc_a", "doc_b")
        .unionByName(
            audio_fingerprint_pairs(
                media, max_hamming=audio_max_hamming, fake=fake
            ).select("doc_a", "doc_b")
        )
        .unionByName(
            video_framehash_pairs(
                media, threshold=video_threshold, fake=fake
            ).select("doc_a", "doc_b")
        )
    )
    keepers = neardup_keepers(media.select("doc_id"), pairs)
    return media.select("doc_id", "media_type").join(keepers, "doc_id")


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
