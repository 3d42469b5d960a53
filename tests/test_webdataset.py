"""WebDataset export (sources/webdataset.py): membership roundtrip,
byte-level determinism across runs and partitionings, manifest
accuracy, and shard-assignment agreement with scrub.shard_assign."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.scrub import shard_assign
from pandas_rust_algos_spark.sources.webdataset import write_webdataset


def _df(spark, n=40):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        F.when(F.col("id") % 7 != 0,
               F.encode(F.concat(F.lit("B"), F.col("id")), "utf-8"))
        .alias("payload"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "wds")
    mani = write_webdataset(
        _df(spark), out, key_col="id", text_cols=["text"],
        binary_cols=["payload"], n_shards=4, salt="t",
    ).collect()
    assert sorted(r["shard"] for r in mani) == [0, 1, 2, 3]
    assert sum(r["n_samples"] for r in mani) == 40

    expected = {r["id"]: r["shard"] for r in
                shard_assign(_df(spark), "id", n_shards=4, salt="t")
                .collect()}
    seen = {}
    for r in mani:
        path = os.path.join(out, f"shard-{r['shard']:05d}.tar")
        data = open(path, "rb").read()
        assert hashlib.sha256(data).hexdigest() == r["sha256"]
        assert len(data) == r["n_bytes"]
        with tarfile.open(path) as tar:
            names = tar.getnames()
            # samples appear in ascending (string) key order
            keys_in_order = [n.split(".")[0] for n in names]
            assert keys_in_order == sorted(keys_in_order, key=str)
            for n in names:
                key = int(n.split(".")[0])
                assert expected[key] == r["shard"]
                if n.endswith(".text.txt"):
                    assert tar.extractfile(n).read() == \
                        f"doc-{key}".encode()
                    seen[key] = True
    assert len(seen) == 40
    # NULL binary column -> member absent, sample still exported
    with tarfile.open(os.path.join(
            out, f"shard-{expected[0]:05d}.tar")) as tar:
        assert "0.text.txt" in tar.getnames()
        assert "0.payload.bin" not in tar.getnames()


def test_byte_determinism_across_runs_and_partitionings(spark, tmp_path):
    hashes = []
    for i, df in enumerate([_df(spark), _df(spark).repartition(13)]):
        out = str(tmp_path / f"run{i}")
        mani = write_webdataset(
            df, out, key_col="id", text_cols=["text"],
            n_shards=3, salt="d",
        ).collect()
        hashes.append({r["shard"]: r["sha256"] for r in mani})
    assert hashes[0] == hashes[1]


def test_requires_columns(spark, tmp_path):
    with pytest.raises(ValueError):
        write_webdataset(_df(spark), str(tmp_path / "x"), key_col="id")
