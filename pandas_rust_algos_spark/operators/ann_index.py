"""Persistent IVF ANN index: build once, query many.

``similarity.ivf_topk`` retrains its coarse quantizer on every call —
right for a one-shot query, wrong for the production shape where an
embedding corpus is indexed nightly and served thousands of probes.
This module persists the IVF layout to storage:

    {path}/meta.json                 n_cells, dims, columns, seed
    {path}/centroids.parquet         (cell, centroid) — KiB-sized
    {path}/cells/cell=<i>/*.parquet  vectors, PARTITIONED BY cell

The partition layout IS the index: a query probes its ``n_probe``
nearest centroids (driver-side math over the KiB centroid table) and
the scan reads ONLY those ``cell=<i>/`` directories — real storage
partition pruning, so query I/O is ~``n_probe/n_cells`` of the corpus
regardless of corpus size, with zero rows filtered after read. The
pruning is asserted by test via ``inputFiles()``.

Build cost: one bounded k-means (sampled training, as in
``ivf_topk``), one assignment map (centroids are a plan literal —
no shuffle), one ``partitionBy(cell)`` write (the single intended
shuffle; it IS the index layout). Rebuilds with the same seed are
deterministic, so two clusters indexing the same corpus agree.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pandas_rust_algos_spark.operators.similarity import (
    _as_double,
    _lit_matrix,
    cosine,
    dot,
    norm,
)

__all__ = ["append_ivf_index", "build_ivf_index", "ivf_index_query"]


def _nearest_cells(cmatrix, vcol, n: int):
    """Top-n cell ids by dot score as a pure expression (matrix is one
    plan literal; struct-sort with cell-id tiebreak) — same formulation
    as similarity.ivf_topk's."""
    scored = F.transform(
        cmatrix,
        lambda c, i: F.struct((-dot(vcol, c)).alias("negd"),
                              i.alias("cell")),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, n),
        lambda s: s.getField("cell"),
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_train_rows: int = 100_000,
) -> dict:
    """Train, assign, and persist; returns the meta dict."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    def unit(vcol):
        return F.transform(vcol, lambda x: x / norm(vcol))

    train = (
        cand.sample(fraction=min(1.0, train_fraction), seed=seed)
        .limit(max_train_rows)
        .select(array_to_vector(unit(F.col("v"))).alias("features"))
        .persist()
    )
    try:
        if train.count() < n_cells * 10:
            train.unpersist()
            train = cand.limit(max_train_rows).select(
                array_to_vector(unit(F.col("v"))).alias("features")
            ).persist()
        km = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    finally:
        train.unpersist()
    centers = [[float(x) for x in c] for c in km.clusterCenters()]

    spark = df.sparkSession
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids.parquet"))

    cmatrix = _lit_matrix(centers)
    assigned = cand.select(
        F.col(id_col).alias("id"),
        F.col("v"),
        _nearest_cells(cmatrix, F.col("v"), 1)[0].alias("cell"),
    )
    assigned.write.mode("overwrite").partitionBy("cell") \
        .parquet(os.path.join(path, "cells"))

    meta = {"n_cells": n_cells, "seed": seed, "id_col": id_col,
            "vec_col": vec_col, "dims": len(centers[0])}
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def append_ivf_index(df: DataFrame, path: str) -> dict:
    """Incrementally index new vectors: assign them to the EXISTING
    coarse quantizer (nearest persisted centroid — no retrain) and
    append into the ``cell=`` partition layout. This is standard IVF
    maintenance (FAISS ``add`` after ``train``): queries through the
    index see old and new vectors uniformly, and the partition-pruning
    contract is untouched because appends can only land in existing
    cells. The trade-off is the usual one — centroids are frozen, so
    if the embedding distribution drifts the new vectors crowd a few
    cells and partial-probe recall decays; rebuild on a schedule (the
    build is one k-means + one partitioned write) to re-balance.

    Scale shape: the centroid matrix rides the assignment projection
    as a plan literal / broadcast row (``_lit_matrix`` switches at the
    same size threshold as ``similarity``), so the append is a single
    narrow pass over the new vectors plus the ``partitionBy(cell)``
    write — no shuffle of the existing corpus, no driver data."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    spark = df.sparkSession
    centers = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("cell").collect()
    )
    cmatrix = _lit_matrix([r["centroid"] for r in centers])
    cand = df.select(
        F.col(meta["id_col"]),
        _as_double(F.col(meta["vec_col"])).alias("v"),
    )
    assigned = cand.select(
        F.col(meta["id_col"]).alias("id"),
        F.col("v"),
        _nearest_cells(cmatrix, F.col("v"), 1)[0].alias("cell"),
    )
    assigned.write.mode("append").partitionBy("cell") \
        .parquet(os.path.join(path, "cells"))
    return meta


def ivf_index_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors per query against a persisted index.
    Returns ``(query_id_col, id, sim, rank)``.

    The probe set is resolved DRIVER-side from the KiB centroid table
    (one tiny collect — metadata, not data), so the cell filter is a
    plan literal and Spark prunes ``cell=`` partitions at file-listing
    time: the corpus scan opens only the probed directories.
    """
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if not 1 <= n_probe <= meta["n_cells"]:
        raise ValueError(
            f"n_probe must be in [1, {meta['n_cells']}], got {n_probe}")
    centers = (
        spark.read.parquet(os.path.join(path, "centroids.parquet"))
        .orderBy("cell").collect()
    )
    cmatrix = _lit_matrix([r["centroid"] for r in centers])

    probes = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn(
        "cell", F.explode(_nearest_cells(cmatrix, F.col("qv"), n_probe))
    ).persist()
    probed_cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )

    cells = (
        spark.read.parquet(os.path.join(path, "cells"))
        .where(F.col("cell").isin(probed_cells))
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), round_digits)
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .where(F.col("qid") != F.col("id"))
        .select(F.col("qid").alias(query_id_col), "id", sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k)
