"""Multimodal plumbing: media wrapping + both feature-extraction paths."""

from __future__ import annotations

import pytest

from pandas_rust_algos_spark.operators import multimodal as mm
from pandas_rust_algos_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    return mm.as_media(d, "doc_id", "text", "image")


def test_media_schema_and_metadata(media):
    rows = media.collect()
    assert media.columns == ["media_id", "modality", "payload",
                             "n_bytes", "content_md5"]
    for r in rows:
        assert r["n_bytes"] == len(r["payload"])
        assert len(r["content_md5"]) == 32


def test_arrow_and_pandas_paths_agree(media):
    """mapInArrow and mapInPandas must produce identical features —
    same decoder, different batch transport."""
    a = {r["media_id"]: r["feature"]
         for r in mm.extract_features(media, decoder="fake").collect()}
    b = {r["media_id"]: r["feature"]
         for r in mm.extract_features_arrow(media, decoder="fake").collect()}
    assert a == b
    assert len(a) == 50


def test_strict_decoder_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|decoder libraries"):
        mm.extract_features(media, decoder="strict").collect()
