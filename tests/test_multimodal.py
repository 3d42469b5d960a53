"""Multimodal plumbing: media wrapping, REAL payload decode (utf-8 text
and packed-f32le vectors), and both feature-extraction transports."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pandas_rust_algos_spark.operators import multimodal as mm
from pandas_rust_algos_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    return mm.as_media(d, "doc_id", "text", "text/utf-8")


@pytest.fixture(scope="module")
def vmedia(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(50)
    return mm.vec_media(e, "vec_id", "embedding")


def test_media_schema_and_metadata(media):
    rows = media.collect()
    assert media.columns == ["media_id", "modality", "payload",
                             "n_bytes", "content_md5"]
    for r in rows:
        assert r["n_bytes"] == len(r["payload"])
        assert len(r["content_md5"]) == 32


def test_text_decode_roundtrip(spark, sf_dir, media):
    """decode_payload inverts the string→binary cast byte-exactly: the
    feature check_md5 (computed from the decoded payload in Python)
    equals the JVM-side md5 of the original payload."""
    jvm = {r["media_id"]: r["content_md5"] for r in media.collect()}
    feats = mm.extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["check_md5"] == jvm[r["media_id"]]
        assert r["f1"] <= r["f0"]        # tokens ≤ chars
        assert r["f3"] <= r["f1"]        # distinct tokens ≤ tokens


def test_vec_decode_roundtrip(spark, sf_dir, vmedia):
    """vec/f32le pack → decode is lossless: features computed from the
    decoded bytes equal features computed from the source arrays."""
    src = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="<f4")
        for r in load_table(spark, sf_dir, "embeddings").limit(50).collect()
    }
    feats = {r["media_id"]: r for r in mm.extract_features(vmedia).collect()}
    assert len(feats) == 50
    for vid, v in src.items():
        r = feats[vid]
        assert r["n_bytes"] == 4 * len(v)
        assert r["f0"] == float(len(v))
        assert r["f2"] == float(v.min())
        assert r["f3"] == float(v.max())
        assert r["check_md5"] is None


def test_arrow_and_pandas_paths_agree(media, vmedia):
    """mapInArrow and mapInPandas must produce identical features —
    same decoder, different batch transport — on BOTH codecs."""
    both = media.unionByName(vmedia)
    key = lambda r: (r["media_id"], r["modality"])  # noqa: E731
    a = {key(r): (r["f0"], r["f1"], r["f2"], r["f3"], r["check_md5"])
         for r in mm.extract_features(both).collect()}
    b = {key(r): (r["f0"], r["f1"], r["f2"], r["f3"], r["check_md5"])
         for r in mm.extract_features_arrow(both).collect()}
    assert a == b
    assert len(a) == 100


def test_decode_payload_local():
    """Unit: the codec functions themselves, no Spark involved."""
    assert mm.decode_payload("héllo".encode(), "text/utf-8") == "héllo"
    v = np.array([1.5, -2.25, 3.0], dtype="<f4")
    out = mm.decode_payload(v.tobytes(), "vec/f32le")
    assert out.dtype == np.float32 and list(out) == [1.5, -2.25, 3.0]
    with pytest.raises(ValueError, match="multiple of 4"):
        mm.decode_payload(b"\x00\x01\x02", "vec/f32le")
    assert hashlib.md5(b"x").hexdigest() == mm._featurize(b"x", "text/utf-8")[4]


def test_strict_decoder_raises(spark, sf_dir):
    """Real media codecs (image/audio/video) raise until decoder libs
    exist — the failure travels through the executor path."""
    d = load_table(spark, sf_dir, "documents").limit(5)
    media = mm.as_media(d, "doc_id", "text", "image")
    with pytest.raises(Exception, match="NotImplementedError|decoder libraries"):
        mm.extract_features(media).collect()
