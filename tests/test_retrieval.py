"""Unit tests for the retrieval / sampling / bloom extensions:
RRF fusion, MMR diversification, priority sampling, bloom decontam.
Semantics on planted fixtures; the cross-engine gates live in the
registry (tests/test_oracle_parity.py covers oracled gates broadly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import datasplit as ds
from pandas_rust_algos_spark.operators import decontam as dc
from pandas_rust_algos_spark.operators import retrieval as rv


# ------------------------------------------------------------------ RRF


def test_rrf_fuse_hand_case(spark):
    """Fusion of two 3-row lists against hand-computed 1/(60+r) sums."""
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long")
    vec = spark.createDataFrame(
        [(12, 1), (10, 2), (13, 3)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in
           rv.rrf_fuse_topk([lex, vec], k=4).collect()}
    # doc 10: 1/61 + 1/62; doc 12: 1/63 + 1/61; doc 11: 1/62; doc 13: 1/63
    assert out[10]["rrf_score"] == 1.0 / 61 + 1.0 / 62
    assert out[12]["rrf_score"] == 1.0 / 63 + 1.0 / 61
    assert out[11]["rrf_score"] == 1.0 / 62
    assert out[13]["rrf_score"] == 1.0 / 63
    # fused order: 10 (0.02577) > 12 (0.02527) > 11 > 13
    assert [out[d]["rank"] for d in (10, 12, 11, 13)] == [1, 2, 3, 4]
    # ranks carried through for audit
    assert out[13]["rank_1"] is None and out[13]["rank_2"] == 3


def test_rrf_requires_input():
    with pytest.raises(ValueError):
        rv.rrf_fuse_topk([])


# ------------------------------------------------------------------ MMR


def test_mmr_penalizes_near_duplicates(spark):
    """Plant a query, two exactly-parallel highly-relevant vectors
    (cosine 1.0 to each other), and one moderately relevant diverse
    vector: plain top-2 keeps both twins; MMR at λ=0.5 must swap the
    second twin for the diverse vector (its full-unit redundancy
    penalty sinks it below the diverse candidate)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),     # query
        (1, [0.9, 0.1, 0.0]),     # twin A (high rel)
        (2, [0.45, 0.05, 0.0]),   # twin B = 0.5 * twin A (cos = 1)
        (3, [0.5, 0.0, 0.8]),     # diverse, moderate rel
        (4, [0.0, 1.0, 0.0]),     # irrelevant
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = rv.mmr_diversify(emb, 0, shortlist_k=4, k=2, lam=0.5)
    got = [r["vec_id"] for r in out.orderBy("sel_rank").collect()]
    assert got[0] in (1, 2)       # most relevant twin first
    assert got[1] == 3            # diversity beats the other twin


def test_mmr_greedy_tie_breaks_by_id():
    rel = {5: 0.5, 3: 0.5}
    picked = rv._mmr_greedy(rel, {(3, 5): 0.0, (5, 3): 0.0}, 1, 0.7)
    assert picked[0][1] == 3


def test_mmr_first_pick_score_is_lambda_rel(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.6, 0.8]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = {r["sel_rank"]: r for r in
           rv.mmr_diversify(emb, 0, shortlist_k=2, k=2, lam=0.7).collect()}
    assert out[1]["mmr"] == 0.7 * out[1]["rel"]


# ------------------------------------------- priority sampling


def _docs_df(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 1).alias("w"))


def test_priority_sample_shape_and_estimator(spark):
    df = _docs_df(spark)
    out = ds.priority_sample(df, "doc_id", "w", 20, salt="t").collect()
    assert len(out) == 20
    assert sorted(r["rank"] for r in out) == list(range(1, 21))
    # est_weight = max(w, tau) >= w, and tau is shared across rows
    taus = {r["est_weight"] for r in out if r["est_weight"] != r["weight"]}
    assert all(r["est_weight"] >= r["weight"] for r in out)
    assert len(taus) <= 1


def test_priority_sample_partitioning_invariant(spark):
    df = _docs_df(spark)
    a = ds.priority_sample(df, "doc_id", "w", 15, salt="t")
    b = ds.priority_sample(df.repartition(13, "doc_id"),
                           "doc_id", "w", 15, salt="t")
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())


def test_priority_sample_huge_weight_always_included(spark):
    """A row whose weight exceeds n·max(other weights)·2^52/(2^52-1)
    has priority w/u ≥ w > every other row's possible priority."""
    df = _docs_df(spark, 100).union(
        _docs_df(spark, 1).select(
            F.lit(9999).alias("doc_id"), F.lit(10 ** 9).alias("w")))
    out = ds.priority_sample(df, "doc_id", "w", 5, salt="t").collect()
    assert 9999 in {r["doc_id"] for r in out}


def test_priority_sample_small_input_no_tau(spark):
    """n <= k: every row sampled, est_weight degrades to w."""
    df = _docs_df(spark, 8)
    out = ds.priority_sample(df, "doc_id", "w", 20, salt="t").collect()
    assert len(out) == 8
    assert all(r["est_weight"] == r["weight"] for r in out)


def test_priority_sample_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        ds.priority_sample(_docs_df(spark), "doc_id", "w", 0)


# ------------------------------------------------- bloom decontam


def _toy_corpus(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high today"),  # shares grams
            (2, "completely different words entirely here now"),
            (3, "xy"),                                    # gramless at n=5
        ],
        "doc_id long, text string")
    return corpus, bench


def test_bloom_no_false_negatives(spark):
    """Bloom flags are a superset of exact hits, per document."""
    corpus, bench = _toy_corpus(spark)
    exact = {r["doc_id"]: r for r in
             dc.decontaminate(corpus, bench, n=5).collect()}
    bloom = {r["doc_id"]: r for r in
             dc.bloom_decontaminate(corpus, bench, n=5).collect()}
    assert set(exact) == set(bloom) == {1, 2, 3}
    for d in exact:
        assert bloom[d]["n_grams"] == exact[d]["n_grams"]
        assert bloom[d]["n_flagged"] >= exact[d]["n_hits"]
    assert bloom[1]["contaminated"]
    assert bloom[3]["n_grams"] == 0 and not bloom[3]["contaminated"]


def test_bloom_fp_rate_bounded_on_clean_doc(spark):
    """At 2^16 bits / 4 hashes with a tiny benchmark the FP rate is
    ~0 — the clean document must stay clean."""
    corpus, bench = _toy_corpus(spark)
    bloom = {r["doc_id"]: r for r in
             dc.bloom_decontaminate(corpus, bench, n=5).collect()}
    assert bloom[2]["n_flagged"] == 0


def test_bloom_matches_duckdb_on_fixture(spark, duck, sf_dir):
    """The gate's cross-engine claim on the real fixture at test SF."""
    from pandas_rust_algos_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = dc.bloom_decontaminate(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        n=5).orderBy("doc_id").collect()
    ora = duck.execute(
        dc.sql_bloom_decontaminate(n=5) + " ORDER BY doc_id"
    ).fetchall()
    assert [(r["doc_id"], r["n_grams"], r["n_flagged"], r["contaminated"])
            for r in out] == [tuple(t) for t in ora]


# ---------------------------------------------- batch BM25


def test_bm25_batch_matches_single_query(spark):
    """One-query batch ≡ the single-query operator (same terms, same
    scores, same ranks)."""
    from pandas_rust_algos_spark.operators import tfidf as ti

    docs = spark.createDataFrame(
        [(1, "spark joins data"), (2, "spark spark window"),
         (3, "nothing relevant"), (4, "window join spark")],
        "doc_id long, text string")
    single = ti.bm25_topk(docs, ["spark", "window"], k=3).collect()
    q = spark.createDataFrame(
        [(7, "spark"), (7, "window")], "query_id long, term string")
    batch = ti.bm25_batch_topk(docs, q, k=3).collect()
    s = {(r["doc_id"], r["rank"]): r["score"] for r in single}
    b = {(r["doc_id"], r["rank"]): r["score"] for r in batch}
    assert s == b
    assert all(r["query_id"] == 7 for r in batch)


def test_bm25_batch_isolates_queries(spark):
    """Terms of one query must not leak into another query's scores."""
    from pandas_rust_algos_spark.operators import tfidf as ti

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha gamma")],
        "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "alpha"), (1, "gamma")], "query_id long, term string")
    out = ti.bm25_batch_topk(docs, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q[0] == {1, 3}
    assert by_q[1] == {2, 3}


# ----------------------------------------- persisted bloom store


def test_bloom_store_append_equals_rebuild(spark, tmp_path):
    """Append ≡ rebuild-from-union, the store's maintenance contract."""
    bench1 = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string")
    bench2 = spark.createDataFrame(
        [(2, "seven eight nine ten eleven twelve")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "one two three four five today"),
         (11, "seven eight nine ten eleven now"),
         (12, "unrelated text goes here friend")],
        "doc_id long, text string")

    inc = str(tmp_path / "inc")
    dc.write_bloom_store(bench1, inc, n=5)
    dc.append_bloom_store(spark, inc, bench2)
    full = str(tmp_path / "full")
    dc.write_bloom_store(bench1.unionByName(bench2), full, n=5)

    a = sorted(map(tuple, dc.bloom_store_decontaminate(
        spark, corpus, inc).collect()))
    b = sorted(map(tuple, dc.bloom_store_decontaminate(
        spark, corpus, full).collect()))
    assert a == b
    flags = {r[0]: r[3] for r in a}
    assert flags == {10: True, 11: True, 12: False}


def test_bloom_store_append_idempotent(spark, tmp_path):
    """Re-ingesting the same suite is a no-op (bitmap union)."""
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    p = str(tmp_path / "s")
    dc.write_bloom_store(bench, p, n=5)
    before = sorted(map(tuple, spark.read.parquet(
        p + "/words.parquet").collect()))
    dc.append_bloom_store(spark, p, bench)
    after = sorted(map(tuple, spark.read.parquet(
        p + "/words.parquet").collect()))
    assert before == after


def test_bloom_rowwise_probe_equals_exploded(spark):
    """The streaming-legal single-aggregation probe must equal the
    batch entry point row-for-row. Since round 10 the batch functions
    DELEGATE to the rowwise probe (one data-sized shuffle instead of
    two), so the exploded-plan equivalence proof lives in the DuckDB
    oracle (sql_bloom_decontaminate still computes the two-level
    explode + BOOL_AND shape) — this test now pins the delegation
    wiring (params threaded through correctly)."""
    corpus, bench = _toy_corpus(spark)
    words = dc._bloom_words(bench, "text", 5, 1 << 16, 4)
    a = sorted(map(tuple, dc.bloom_decontaminate(
        corpus, bench, n=5).collect()))
    b = sorted(map(tuple, dc.bloom_probe_rowwise(
        corpus, words, n=5).collect()))
    assert a == b


def test_priority_sample_stratified_per_stratum(spark):
    """Each stratum yields k rows with ranks 1..k and its own tau;
    the within-stratum sample equals the global sampler run on that
    stratum alone (same salt => same priorities)."""
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("s"),
        (F.col("id") % 11 + 1).alias("w"))
    out = ds.priority_sample_stratified(
        df, "s", "doc_id", "w", 10, salt="t").collect()
    by_s = {}
    for r in out:
        by_s.setdefault(r["s"], []).append(r)
    assert set(by_s) == {"0", "1", "2"}
    for s, rows in by_s.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, 11))
        solo = ds.priority_sample(
            df.where(F.col("s") == s), "doc_id", "w", 10, salt="t"
        ).collect()
        assert sorted(r["doc_id"] for r in rows) == \
               sorted(r["doc_id"] for r in solo)
        assert sorted(r["est_weight"] for r in rows) == \
               sorted(r["est_weight"] for r in solo)


def test_rrf_three_rankers(spark):
    """N>2 fusion: term order is the declared list order and missing
    lists contribute zero."""
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    c = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in
           rv.rrf_fuse_topk([a, b, c], k=3).collect()}
    assert out[1]["rrf_score"] == 1.0 / 61 + 1.0 / 62
    assert out[2]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[3]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[1]["rank_2"] is None and out[1]["rank_3"] == 2


def test_dedup_soft_weights_semantics(spark):
    from pandas_rust_algos_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same  text."), (3, "different")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in dd.dedup_soft_weights(df).collect()}
    # 1 and 2 normalize to the same content -> cluster of 2
    assert out[1]["n_copies"] == 2 and out[2]["n_copies"] == 2
    assert out[1]["weight"] == 0.5 and out[3]["weight"] == 1.0
    assert out[1]["is_rep"] and not out[2]["is_rep"] and out[3]["is_rep"]
    # weights sum to the number of unique contents
    assert sum(r["weight"] for r in out.values()) == 2.0


def test_dedup_soft_weights_whale_immune_plan(spark):
    """Planted boilerplate whale: one content with 200 copies. The
    per-content stats must come from a map-side-combinable aggregate
    joined back — NOT a window over partitionBy(content_hash), which
    would funnel every copy of the whale through one sort partition
    at scale. Pin both the semantics and the plan shape."""
    from pandas_rust_algos_spark.operators import dedup as dd

    rows = [(i, "boilerplate   Error page!") for i in range(200)]
    rows += [(1000 + i, f"unique doc {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.dedup_soft_weights(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "whale-exposed window is back"
    got = out.collect()
    assert len(got) == 250
    whale = [r for r in got if r["n_copies"] == 200]
    assert len(whale) == 200
    assert all(r["weight"] == 1.0 / 200 for r in whale)
    reps = [r["doc_id"] for r in whale if r["is_rep"]]
    assert reps == [0]  # min-id representative, exactly one
    assert sum(r["weight"] for r in got) == pytest.approx(51.0)


def test_priority_sample_estimator_subset_sum(spark, sf_dir):
    """Estimator quality on the real fixture: Σ est_weight over the
    sample is the unbiased estimator of the corpus's total weight —
    for this deterministic (salt-fixed) draw of 40/500 it must land
    within 25% of the true Σ n_chars (loose enough for any single
    draw, tight enough to catch a broken τ)."""
    from pandas_rust_algos_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    true_total = docs.agg(F.sum("n_chars")).collect()[0][0]
    out = ds.priority_sample(docs, "doc_id", "n_chars", 40,
                             salt="gate").collect()
    est_total = sum(r["est_weight"] for r in out)
    assert abs(est_total - true_total) / true_total < 0.25, (
        est_total, true_total)
