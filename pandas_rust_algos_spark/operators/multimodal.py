"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with REAL decoders for the payload codecs this container can express.

Design: a media item is a row with an opaque ``binary`` column plus
typed metadata (modality, byte size, content hash). The modality string
names the payload codec, and decode is genuinely implemented for:

- ``text/utf-8``  — UTF-8 bytes → str (documents fixture);
- ``vec/f32le``   — packed little-endian float32 → ndarray (embeddings
  fixture);
- ``image/bmp``   — uncompressed 24-bit BI_RGB Windows bitmap → HxWx3
  uint8 array (header parse + strided raster read, numpy only);
- ``image/ppm``   — binary PPM (P6) → HxWx3 uint8 array;
- ``audio/pcm_s16le`` — raw 16-bit little-endian PCM → int16 samples;
- ``video/ppm-seq``   — concatenated P6 frames → list of frames, with
  :func:`sample_frames` exploding every k-th frame to its own
  ``image/ppm`` media row (the frame-sampling step of a video
  pipeline).

Only *compressed* codecs (JPEG/PNG/MP3/H.264…) raise
``NotImplementedError`` — their entropy coders genuinely need decoder
libraries this container does not ship; the uncompressed formats above
are decoded for real, so the dispatch, batch transport, feature, and
transform plumbing is exercised end-to-end by true byte-level decodes.
:func:`resize_media` (nearest-neighbor, pure index arithmetic)
re-encodes decoded images back to media rows — the
decode→transform→re-encode loop a training-data image pipeline runs.

Features are chosen to be deterministic AND oracle-expressible (DuckDB
computes the same values straight from the source tables), so the
decode→featurize path is hash-checked end-to-end by the driver gate,
not just rows-counted. The vec sum uses fixed-point micro-units
(floor(x·1e6) summed as int) — exact and associative, so the result is
independent of batch/partition boundaries and engine.

Scale notes: binary payloads dominate partition size, so the batch
iterator in :func:`extract_features` controls memory as
(maxRecordsPerBatch × payload) — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large media, and
never groupBy the payload itself (metadata carries the join keys).
Only (id, metadata, features) leave the Python worker; payloads are
dropped before any exchange.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "as_media",
    "vec_media",
    "decode_payload",
    "decode_strict",
    "encode_bmp",
    "encode_ppm",
    "encode_pcm_s16le",
    "encode_ppm_seq",
    "extract_features",
    "extract_features_arrow",
    "resize_media",
    "sample_frames",
]

#: canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # payload codec name
    StructField("payload", BinaryType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_md5", StringType(), False),
])

#: decode→featurize output: fixed-width doubles + a text checksum that
#: proves the decode round-trip byte-exactly (NULL for non-text)
FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("f0", DoubleType(), True),
    StructField("f1", DoubleType(), True),
    StructField("f2", DoubleType(), True),
    StructField("f3", DoubleType(), True),
    StructField("check_md5", StringType(), True),
])


# ------------------------------------------------------ codecs (encode)


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BI_RGB Windows bitmap
    (bottom-up raster, BGR byte order, rows padded to 4 bytes)."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def _decode_bmp(payload: bytes) -> np.ndarray:
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP variant bpp={bpp} compression={comp} not supported "
            "(24-bit BI_RGB only)")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                           offset=offset).reshape(h, stride)
    img = raster[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def _ppm_read_frame(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one P6 frame starting at ``pos``; returns (HxWx3, next pos).
    Handles arbitrary whitespace and ``#`` comments in the header."""
    if payload[pos:pos + 2] != b"P6":
        raise ValueError(f"not a P6 frame at offset {pos}")
    pos += 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("P6 maxval != 255 not supported")
    n = w * h * 3
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape(h, w, 3).copy(), pos + n


def encode_pcm_s16le(samples: np.ndarray) -> bytes:
    """int16 samples → raw little-endian PCM bytes."""
    return np.asarray(samples, dtype="<i2").tobytes()


def encode_ppm_seq(frames: list[np.ndarray]) -> bytes:
    """Frame list → concatenated P6 stream (the ``video/ppm-seq``
    codec: video-as-frames with zero temporal compression)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_payload(payload: bytes, modality: str):
    """Decode a payload per its modality codec.

    Returns ``str`` (text/utf-8), float32 ndarray (vec/f32le), HxWx3
    uint8 ndarray (image/bmp, image/ppm), int16 ndarray
    (audio/pcm_s16le), or list of HxWx3 frames (video/ppm-seq).
    Compressed codecs raise ``NotImplementedError`` — their entropy
    coders need decoder libraries absent from this container.
    """
    payload = bytes(payload)
    if modality == "text/utf-8":
        return payload.decode("utf-8")
    if modality == "vec/f32le":
        if len(payload) % 4:
            raise ValueError(
                f"vec/f32le payload length {len(payload)} not a multiple of 4"
            )
        return np.frombuffer(payload, dtype="<f4")
    if modality == "image/bmp":
        return _decode_bmp(payload)
    if modality == "image/ppm":
        img, _end = _ppm_read_frame(payload, 0)
        return img
    if modality == "audio/pcm_s16le":
        if len(payload) % 2:
            raise ValueError(
                f"pcm_s16le payload length {len(payload)} not a multiple of 2")
        return np.frombuffer(payload, dtype="<i2")
    if modality == "video/ppm-seq":
        frames, pos = [], 0
        while pos < len(payload):
            frame, pos = _ppm_read_frame(payload, pos)
            frames.append(frame)
        return frames
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires decoder libraries "
        "not present in this environment (uncompressed codecs — bmp/ppm/"
        "pcm_s16le/ppm-seq — are decoded natively)"
    )


#: kept as the explicit "real media" entry point name
decode_strict = decode_payload


def _featurize(payload: bytes, modality: str):
    """Decode, then derive the fixed feature tuple (f0..f3, check_md5).

    text/utf-8: (n_chars, n_tokens, n_spaces, n_distinct_tokens,
    md5-of-bytes) — the md5 doubles as a byte-exact round-trip proof.
    vec/f32le: (dim, fixed-point micro sum, min, max, NULL) — all exact
    in float64, so no rounding is needed anywhere.
    """
    content = decode_payload(payload, modality)
    if modality == "text/utf-8":
        toks = content.split()
        return (
            float(len(content)),
            float(len(toks)),
            float(content.count(" ")),
            float(len(set(toks))),
            hashlib.md5(bytes(payload)).hexdigest(),
        )
    if modality in ("image/bmp", "image/ppm"):
        h, w, c = content.shape
        # exact: integer pixel sum / count (both exact in float64)
        return (float(h), float(w),
                float(int(content.sum(dtype=np.int64)) / (h * w * c)),
                float(c), None)
    if modality == "audio/pcm_s16le":
        n = len(content)
        if n == 0:
            return (0.0, None, None, None, None)
        mean_abs = int(np.abs(content.astype(np.int64)).sum()) / n
        return (float(n), float(mean_abs),
                float(content.min()), float(content.max()), None)
    if modality == "video/ppm-seq":
        if not content:
            return (0.0, None, None, None, None)
        h, w, c = content[0].shape
        total = sum(int(f.sum(dtype=np.int64)) for f in content)
        npx = sum(f.size for f in content)
        return (float(len(content)), float(h), float(w),
                float(total / npx), None)
    dim = len(content)
    if dim == 0:
        return (0.0, 0.0, None, None, None)
    micro = sum(int(math.floor(float(x) * 1e6)) for x in content)
    return (
        float(dim),
        micro / 1e6,
        float(content.min()),
        float(content.max()),
        None,
    )


def as_media(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap an arbitrary binary-castable column into the canonical media
    schema (metadata computed JVM-side; a string column casts to its
    UTF-8 bytes, i.e. the ``text/utf-8`` codec)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def vec_media(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Pack a float-array column into ``vec/f32le`` media rows.

    The pack runs as an Arrow-batched pandas UDF — this is the ingestion
    boundary where raw media enters the engine, the one place bytes are
    *produced* rather than decoded. float32 → bytes is exact, so
    decode_payload inverts it losslessly.
    """
    @F.pandas_udf("binary")
    def _pack(vs: pd.Series) -> pd.Series:
        return vs.map(lambda v: np.asarray(v, dtype="<f4").tobytes())

    packed = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _pack(F.col(vec_col)).alias("payload"),
    )
    return packed.select(
        "media_id",
        F.lit("vec/f32le").alias("modality"),
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    The UDF boundary is per-batch (not per-row): each pandas DataFrame
    chunk arrives as one Arrow batch; only (id, metadata, features)
    leave the worker — payloads are dropped before the exchange.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _featurize(payload, modality)
                for payload, modality in zip(pdf["payload"], pdf["modality"])
            ]
            cols = list(zip(*feats)) if feats else [[], [], [], [], []]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "f0": pd.Series(cols[0], dtype="float64"),
                "f1": pd.Series(cols[1], dtype="float64"),
                "f2": pd.Series(cols[2], dtype="float64"),
                "f3": pd.Series(cols[3], dtype="float64"),
                "check_md5": pd.Series(cols[4], dtype="object"),
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the batch
    arrives as a pyarrow RecordBatch and never round-trips through
    pandas. For binary-heavy media rows that conversion is the dominant
    UDF cost (pandas boxes each payload into a Python bytes object even
    when untouched), so this is the preferred path once payloads exceed
    a few KB; the pandas variant stays for ergonomics."""
    import pyarrow as pa

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column("payload")
            modalities = batch.column("modality")
            feats = [
                _featurize(payloads[i].as_py(), modalities[i].as_py())
                for i in range(batch.num_rows)
            ]
            cols = list(zip(*feats)) if feats else [[], [], [], [], []]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    batch.column("modality"),
                    batch.column("n_bytes"),
                    pa.array(cols[0], type=pa.float64()),
                    pa.array(cols[1], type=pa.float64()),
                    pa.array(cols[2], type=pa.float64()),
                    pa.array(cols[3], type=pa.float64()),
                    pa.array(cols[4], type=pa.string()),
                ],
                names=["media_id", "modality", "n_bytes",
                       "f0", "f1", "f2", "f3", "check_md5"],
            )

    return media.mapInArrow(fn, schema=FEATURE_SCHEMA)


# ------------------------------------------------- media transforms


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize as pure index arithmetic (the standard
    pixel-center mapping: src = floor((dst + 0.5) · scale))."""
    sh, sw = img.shape[:2]
    rows = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64),
                      sh - 1)
    cols = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64),
                      sw - 1)
    return img[rows[:, None], cols[None, :]]


def _media_row(media_id, modality: str, payload: bytes) -> dict:
    return {
        "media_id": media_id,
        "modality": modality,
        "payload": payload,
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def _media_frame(rows: list[dict]) -> pd.DataFrame:
    cols = ["media_id", "modality", "payload", "n_bytes", "content_md5"]
    return pd.DataFrame(
        {c: [r[c] for r in rows] for c in cols}
        if rows else {c: [] for c in cols}
    )


def resize_media(media: DataFrame, height: int, width: int) -> DataFrame:
    """Decode image media rows, nearest-neighbor resize to
    ``height × width``, re-encode as ``image/ppm`` media rows — the
    decode → transform → re-encode loop of an image preprocessing
    pipeline, Arrow-batched end-to-end. Non-image modalities pass
    through untouched (a mixed-modality table needs no pre-split)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"]):
                if modality in ("image/bmp", "image/ppm"):
                    img = decode_payload(payload, modality)
                    out = encode_ppm(_resize_nearest(img, height, width))
                    rows.append(_media_row(mid, "image/ppm", out))
                else:
                    rows.append(_media_row(mid, modality, bytes(payload)))
            yield _media_frame(rows)

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 1) -> DataFrame:
    """Explode ``video/ppm-seq`` rows into one ``image/ppm`` media row
    per ``every``-th frame (media_id becomes ``video_id * 10^6 +
    frame_idx`` so frames stay traceable and unique). Frame sampling is
    the standard first step of a video training pipeline; payload rows
    only ever *grow* partition-locally — no shuffle, no driver data."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"]):
                if modality != "video/ppm-seq":
                    continue
                for idx, frame in enumerate(decode_payload(payload, modality)):
                    if idx % every == 0:
                        rows.append(_media_row(
                            mid * 1_000_000 + idx, "image/ppm",
                            encode_ppm(frame)))
            yield _media_frame(rows)

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)
