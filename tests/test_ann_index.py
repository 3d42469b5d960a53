"""Persistent IVF index (operators/ann_index.py): recall vs brute
force, storage partition pruning (the probe scan must open ONLY probed
cell directories), rebuild determinism, and arg validation."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.ann_index import (
    build_ivf_index, ivf_index_query,
)
from pandas_rust_algos_spark.operators.similarity import cosine_topk


def _corpus(spark, n=400, d=8):
    # deterministic clustered-ish vectors: 4 coarse directions + jitter
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda j: (
                F.when((F.col("id") % 4) == (j % 4), F.lit(10.0))
                .otherwise(F.lit(0.0))
                + F.sin(F.col("id") * (j + 1))
            ),
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    meta = build_ivf_index(_corpus(spark), path, n_cells=8, seed=7)
    return path, meta


def test_layout_and_meta(spark, index):
    path, meta = index
    assert meta["n_cells"] == 8 and meta["dims"] == 8
    cells = [d for d in os.listdir(os.path.join(path, "cells"))
             if d.startswith("cell=")]
    assert 1 < len(cells) <= 8
    total = spark.read.parquet(os.path.join(path, "cells")).count()
    assert total == 400


def test_recall_vs_bruteforce(spark, index):
    path, _ = index
    queries = _corpus(spark).where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(_corpus(spark), queries, k=5)
    got = ivf_index_query(spark, path, queries, n_probe=4, k=5)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["id"]) for r in got.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.6, recall


def test_partition_pruning_on_probed_cells(spark, index):
    path, _ = index
    queries = _corpus(spark).limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_index_query(spark, path, queries, n_probe=2, k=3)
    # the probed-cell filter must reach the scan as a PARTITION filter
    # (file-listing-time pruning), not a post-scan row filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]
    # and the filter is selective: at most the 2 probed cell values
    in_vals = re.search(r"cell#\d+L? IN \(([^)]*)\)", m.group(1))
    assert in_vals and len(in_vals.group(1).split(",")) <= 2, m.group(1)


def test_rebuild_is_deterministic(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_ivf_index(_corpus(spark), a, n_cells=6, seed=11)
    build_ivf_index(_corpus(spark), b, n_cells=6, seed=11)
    ca = spark.read.parquet(os.path.join(a, "centroids.parquet")) \
        .orderBy("cell").collect()
    cb = spark.read.parquet(os.path.join(b, "centroids.parquet")) \
        .orderBy("cell").collect()
    assert [r["centroid"] for r in ca] == [r["centroid"] for r in cb]
    qa = spark.read.parquet(os.path.join(a, "cells")) \
        .select("id", "cell").collect()
    qb = spark.read.parquet(os.path.join(b, "cells")) \
        .select("id", "cell").collect()
    assert sorted(map(tuple, qa)) == sorted(map(tuple, qb))


def test_bad_probe_count(spark, index):
    path, _ = index
    q = _corpus(spark).limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError):
        ivf_index_query(spark, path, q, n_probe=99)


def test_append_assigns_to_frozen_cells(spark, tmp_path):
    from pandas_rust_algos_spark.operators.ann_index import append_ivf_index

    path = str(tmp_path / "idx")
    full = _corpus(spark, n=300)
    build_ivf_index(full.where(F.col("vec_id") % 2 == 0), path,
                    n_cells=8, seed=7)
    cells_before = {d for d in os.listdir(os.path.join(path, "cells"))
                    if d.startswith("cell=")}
    append_ivf_index(full.where(F.col("vec_id") % 2 == 1), path)
    cells_after = {d for d in os.listdir(os.path.join(path, "cells"))
                   if d.startswith("cell=")}
    # the frozen quantizer can only route into existing cells
    assert cells_after == cells_before
    data = spark.read.parquet(os.path.join(path, "cells"))
    assert data.count() == 300
    assert data.select("id").distinct().count() == 300


def test_append_query_equals_bruteforce_at_full_probe(spark, tmp_path):
    from pandas_rust_algos_spark.operators.ann_index import append_ivf_index

    path = str(tmp_path / "idx")
    full = _corpus(spark, n=200)
    build_ivf_index(full.where(F.col("vec_id") % 2 == 0), path,
                    n_cells=4, seed=7)
    append_ivf_index(full.where(F.col("vec_id") % 2 == 1), path)
    queries = full.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_index_query(spark, path, queries, n_probe=4, k=3)
    want = cosine_topk(full, queries, k=3,
                       id_col="vec_id", query_id_col="query_id")
    g = {(r["query_id"], r["rank"]): r["id"] for r in got.collect()}
    w = {(r["query_id"], r["rank"]): r["vec_id"] for r in want.collect()}
    assert g == w


def test_append_keeps_partition_pruning(spark, tmp_path):
    from pandas_rust_algos_spark.operators.ann_index import append_ivf_index

    path = str(tmp_path / "idx")
    full = _corpus(spark, n=300)
    build_ivf_index(full.where(F.col("vec_id") % 2 == 0), path,
                    n_cells=8, seed=7)
    append_ivf_index(full.where(F.col("vec_id") % 2 == 1), path)
    queries = full.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_index_query(spark, path, queries, n_probe=2, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]
    in_vals = re.search(r"cell#\d+L? IN \(([^)]*)\)", m.group(1))
    assert in_vals and len(in_vals.group(1).split(",")) <= 2, m.group(1)


def test_ivfpq_index_matches_inmemory_and_prunes(spark, tmp_path):
    """The persisted fixed-point IVF+PQ index: (1) the disk read path
    is BIT-IDENTICAL to the in-memory composed op with the same
    params (storage layout, cell routing, ADC all value-equal), and
    (2) a partial probe reads only the probed cell= directories of
    the CODE table (real storage partition pruning)."""
    import re

    from pandas_rust_algos_spark.operators.ann_index import (
        build_ivfpq_index_fixed,
        ivfpq_index_query_fixed,
    )
    from pandas_rust_algos_spark.operators.ann_portable import (
        ivfpq_topk_fixed,
    )

    path = str(tmp_path / "ivfpq")
    full = _corpus(spark)
    build_ivfpq_index_fixed(full, path, n_cells=8, m=4, k_codes=4,
                            iters=1)
    queries = full.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = {(r["query_id"], r["id"], r["approx_dist_sq"], r["rank"])
           for r in ivfpq_index_query_fixed(
               spark, path, queries, n_probe=3, k=4).collect()}
    want = {(r["query_id"], r["vec_id"], r["approx_dist_sq"],
             r["rank"])
            for r in ivfpq_topk_fixed(
                full, queries, k=4, n_cells=8, n_probe=3, m=4,
                k_codes=4, iters=1).collect()}
    assert got == want and len(got) > 0

    one = full.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivfpq_index_query_fixed(spark, path, one, n_probe=2, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]
    in_vals = re.search(r"cell#\d+L? IN \(([^)]*)\)", m.group(1))
    assert in_vals and len(in_vals.group(1).split(",")) <= 2, m.group(1)

    # (3) persisted rerank path == in-memory rerank path (which is
    # itself oracled via the ann_ivfpq_rerank_topk gate): exact
    # shortlist re-scores against the raw vector table bit-match
    got_rr = {(r["query_id"], r["id"], r["dist_sq"], r["rank"])
              for r in ivfpq_index_query_fixed(
                  spark, path, queries, n_probe=3, k=4,
                  rerank_k=10, vectors=full).collect()}
    want_rr = {(r["query_id"], r["vec_id"], r["dist_sq"], r["rank"])
               for r in ivfpq_topk_fixed(
                   full, queries, k=4, n_cells=8, n_probe=3, m=4,
                   k_codes=4, iters=1, rerank_k=10).collect()}
    assert got_rr == want_rr and len(got_rr) > 0

    with pytest.raises(ValueError, match="n_probe"):
        ivfpq_index_query_fixed(spark, path, one, n_probe=9)
    with pytest.raises(ValueError, match="divisible"):
        build_ivfpq_index_fixed(full, path + "2", m=3)
    with pytest.raises(ValueError, match="rerank_k"):
        ivfpq_index_query_fixed(spark, path, one, k=5, rerank_k=2,
                                vectors=full)
    with pytest.raises(ValueError, match="vector table"):
        ivfpq_index_query_fixed(spark, path, one, k=3, rerank_k=10)
