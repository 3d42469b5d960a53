"""WebDataset-style tar-shard export — the delivery format of large
multimodal training pipelines (one ``.tar`` per shard; each sample is
a group of same-stem members: ``<key>.txt``, ``<key>.bin``, …; loaders
stream shards sequentially, so shard count = read parallelism).

Reproducibility is the design center: tar is a byte format full of
nondeterminism (mtimes, uids, member order), so this writer pins all
of it — members sort by sample key, mtime/uid/gid are zero, PAX
headers are avoided — making a shard's bytes a PURE FUNCTION of its
row set. Re-running the export yields byte-identical shards with
byte-identical SHA-256s, which is what lets a training run's data
manifest be diffed, cached, and audited across clusters.

Scale shape: shard membership is the engine's deterministic salted-md5
``shard_assign`` (a row property — stable under retries and
repartitioning), the ONE shuffle is ``repartition(n_shards, shard)``
(which IS the intended layout), and each output partition streams its
rows into one tar via Arrow batches (``mapInPandas``) — no driver
involvement, no per-file commit coordination beyond the filesystem.
The returned manifest (shard, samples, bytes, sha256) is
executor-computed and tiny.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from pandas_rust_algos_spark.operators.scrub import shard_assign

__all__ = ["write_webdataset"]


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    *,
    key_col: str,
    text_cols: Sequence[str] = (),
    binary_cols: Sequence[str] = (),
    n_shards: int = 8,
    salt: str = "wds-v1",
    prefix: str = "shard",
) -> DataFrame:
    """Export rows as ``{out_dir}/{prefix}-{shard:05d}.tar`` and return
    the manifest DataFrame ``(shard, n_samples, n_bytes, sha256)``.

    Each row becomes one sample: ``{key}.{col}.txt`` per text column
    (UTF-8) and ``{key}.{col}.bin`` per binary column. Rows write in
    ascending key order within a shard and all tar metadata is zeroed,
    so shard bytes — and therefore the manifest SHA-256s — are
    deterministic for a given (data, salt, n_shards).
    """
    if not text_cols and not binary_cols:
        raise ValueError("need at least one text or binary column")
    cols = [key_col, *text_cols, *binary_cols]
    os.makedirs(out_dir, exist_ok=True)

    sharded = (
        shard_assign(df.select(*cols), key_col,
                     n_shards=n_shards, salt=salt)
        .repartition(n_shards, "shard")
    )
    text_list, bin_list = list(text_cols), list(binary_cols)

    def write_partition(batches):
        import pandas as pd

        # hash partitioning guarantees one shard never splits across
        # partitions, but a partition may carry SEVERAL shards (hash
        # collisions mod n_shards) — group and write one tar per shard
        by_shard: dict[int, list[tuple[str, dict]]] = {}
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                by_shard.setdefault(int(d["shard"]), []).append(
                    (str(d[key_col]), d))
        out_rows = []
        for shard_id in sorted(by_shard):
            rows = sorted(by_shard[shard_id], key=lambda kv: kv[0])
            buf = io.BytesIO()
            # USTAR, not PAX: PAX emits per-member extended headers
            # whose content can vary across python versions — USTAR is
            # the stable subset (names here are short by construction)
            with tarfile.open(fileobj=buf, mode="w",
                              format=tarfile.USTAR_FORMAT) as tar:
                def add(name: str, payload: bytes) -> None:
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(payload))

                for key, d in rows:
                    for c in text_list:
                        v = d[c]
                        if v is not None:
                            add(f"{key}.{c}.txt", str(v).encode("utf-8"))
                    for c in bin_list:
                        v = d[c]
                        if v is not None:
                            add(f"{key}.{c}.bin", bytes(v))
            payload = buf.getvalue()
            path = os.path.join(out_dir, f"{prefix}-{shard_id:05d}.tar")
            with open(path, "wb") as fh:
                fh.write(payload)
            out_rows.append((shard_id, len(rows), len(payload),
                             hashlib.sha256(payload).hexdigest()))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["shard", "n_samples", "n_bytes", "sha256"])

    manifest = sharded.mapInPandas(
        write_partition,
        schema="shard int, n_samples long, n_bytes long, sha256 string",
    )
    return manifest.orderBy("shard")
