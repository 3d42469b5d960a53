"""Similarity-search tests: brute-force cosine against a NumPy oracle,
and LSH recall measured against the brute-force result (the standard
ANN quality metric — LSH trades recall for scan fraction)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import similarity as sim
from pandas_rust_algos_spark.sources import load_table

K = 5
N_QUERIES = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def numpy_topk(emb_pdf, k=K):
    ids = emb_pdf["vec_id"].to_numpy()
    M = np.stack(emb_pdf["embedding"].to_numpy()).astype("float64")
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qi in range(N_QUERIES):
        qrow = np.where(ids == qi)[0][0]
        sims = np.round(M @ M[qrow], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qi),
            key=lambda i: (-sims[i], ids[i]),
        )
        out[qi] = [int(ids[i]) for i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb, queries):
    got = {}
    for r in sim.cosine_topk(emb, queries, k=K).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    want = numpy_topk(emb.toPandas())
    for qid, pairs in got.items():
        ordered = [v for _, v in sorted(pairs)]
        assert ordered == want[qid], f"query {qid}"


def test_lsh_recall_vs_bruteforce(spark, emb, queries):
    brute = numpy_topk(emb.toPandas())
    approx = {}
    for r in sim.lsh_topk(emb, queries, k=K).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(approx.get(q, set()) & set(brute[q])) / K for q in brute
    ]
    mean_recall = sum(recalls) / len(recalls)
    # 16 hyperplanes / 2 bands of 8 bits: recall well above random
    # (random K-of-N would be ~K/N = 0.25% at N=2000)
    assert mean_recall >= 0.2, f"mean recall {mean_recall:.2f}"


def test_lsh_sims_are_exact_within_candidates(spark, emb, queries):
    # LSH approximates the candidate set, never the similarity itself:
    # every (query, candidate) sim must equal the brute-force cosine
    brute = {
        (r["query_id"], r["vec_id"]): r["sim"]
        for r in sim.cosine_topk(emb, queries, k=10**6).collect()
    }
    for r in sim.lsh_topk(emb, queries, k=K).collect():
        assert brute[(r["query_id"], r["vec_id"])] == r["sim"]


def test_ivf_recall_vs_bruteforce(spark, emb, queries):
    brute = numpy_topk(emb.toPandas())
    approx = {}
    for r in sim.ivf_topk(emb, queries, k=K, n_cells=16, n_probe=4).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(approx.get(q, set()) & set(brute[q])) / K for q in brute]
    mean_recall = sum(recalls) / len(recalls)
    # probing 4 of 16 data-adapted cells: recall far above the 25%
    # corpus fraction scanned
    assert mean_recall >= 0.4, f"mean recall {mean_recall:.2f}"
