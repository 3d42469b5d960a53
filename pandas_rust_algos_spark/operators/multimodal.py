"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: an image/audio/video is a row with an opaque ``binary`` column
plus a typed metadata struct (modality, byte size, content hash). All
Spark-side plumbing — schema, partition sizing, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual media *decode*
is stubbed (the decode libraries are not in this container) behind
``DECODERS``: a clearly-marked deterministic fake per modality, with
``decode_strict`` raising NotImplementedError for real use.

Scale notes: binary payloads dominate partition size, so the batch
iterator in :func:`extract_features` controls memory as
(maxRecordsPerBatch × payload) — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large media, and
never groupBy the payload itself (metadata carries the join keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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
    "extract_features",
    "extract_features_arrow",
    "decode_strict",
]

#: canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image|audio|video
    StructField("payload", StringType(), False),    # binary cast shown below
    StructField("n_bytes", LongType(), False),
    StructField("content_md5", StringType(), False),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("feature", ArrayType(DoubleType()), False),
])


def decode_strict(payload: bytes, modality: str, dim: int | None = None):
    """Real decode entry point — NOT IMPLEMENTED in this container
    (no image/audio libraries available). Swap in cv2/PIL/torchaudio
    decoders in a full deployment."""
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires decoder libraries "
        "not present in this environment"
    )


def _fake_decode_features(payload: bytes, modality: str, dim: int = 8) -> list[float]:
    """Deterministic FAKE decode used for plumbing tests: derives a
    feature vector from payload bytes. Replace with decode_strict +
    a real feature extractor in production."""
    acc = []
    for j in range(dim):
        h = 2166136261
        for i, byte in enumerate(payload):
            h = (h ^ (byte + j + i)) * 16777619 % (1 << 32)
        acc.append((h % 10_000) / 10_000.0)
    return acc


#: modality → decoder; tests monkeypatch/verify both entries exist
DECODERS = {
    "fake": _fake_decode_features,
    "strict": decode_strict,
}


def as_media(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap an arbitrary binary column into the canonical media schema
    (metadata computed JVM-side)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def extract_features(media: DataFrame, *, decoder: str = "fake", dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    The UDF boundary is per-batch (not per-row): each pandas DataFrame
    chunk arrives as one Arrow batch, features are computed vectorized
    per chunk, and only (id, metadata, feature) leaves the worker —
    payloads are dropped before the exchange.
    """
    decode = DECODERS[decoder]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(payload, modality, dim)
                for payload, modality in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "feature": feats,
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def extract_features_arrow(
    media: DataFrame, *, decoder: str = "fake", dim: int = 8
) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the batch
    arrives as a pyarrow RecordBatch and never round-trips through
    pandas. For binary-heavy media rows that conversion is the dominant
    UDF cost (pandas boxes each payload into a Python bytes object even
    when untouched), so this is the preferred path once payloads exceed
    a few KB; the pandas variant stays for ergonomics."""
    import pyarrow as pa

    decode = DECODERS[decoder]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column("payload")
            modalities = batch.column("modality")
            feats = [
                decode(payloads[i].as_py(), modalities[i].as_py(), dim)
                for i in range(batch.num_rows)
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    batch.column("modality"),
                    batch.column("n_bytes"),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["media_id", "modality", "n_bytes", "feature"],
            )

    return media.mapInArrow(fn, schema=FEATURE_SCHEMA)
