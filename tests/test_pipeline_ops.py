"""Round-3 training-pipeline operators: benchmark decontamination
(operators/decontam.py), Gopher repetition signals (text.py), and
domain-mixture sampling (datasplit.py) — semantics on planted inputs
plus the scale/plan properties the modules claim."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.datasplit import domain_mix_sample
from pandas_rust_algos_spark.operators.decontam import decontaminate
from pandas_rust_algos_spark.operators.text import repetition_signals


# ------------------------------------------------------------- decontam


@pytest.fixture(scope="module")
def contam_corpus(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "clean text with no overlap whatsoever in here at all"),
         # contains overlapping bench 5-grams "the quick brown fox jumps"
         # and "quick brown fox jumps over"
         (2, "she saw the quick brown fox jumps over a fence today"),
         # contains two bench grams
         (3, "pack my box with five dozen liquor jugs he said"),
         (4, "short doc"),  # < 5 tokens: zero grams
        ],
        "doc_id long, text string")
    return corpus, bench


def test_decontaminate_flags_and_counts(spark, contam_corpus):
    corpus, bench = contam_corpus
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench).collect()}
    assert set(out) == {1, 2, 3, 4}, "every corpus doc reports, even gramless"
    assert not out[1]["contaminated"] and out[1]["n_hits"] == 0
    assert out[2]["contaminated"] and out[2]["n_hits"] == 2
    # doc 3 contains the full 8-token bench doc 101 → 8-5+1 = 4 grams hit
    assert out[3]["contaminated"] and out[3]["n_hits"] == 4
    assert out[4]["n_grams"] == 0 and not out[4]["contaminated"]


def test_decontaminate_hashed_path_matches_exact(spark, contam_corpus):
    corpus, bench = contam_corpus
    exact = {(r["doc_id"], r["n_grams"], r["n_hits"], r["contaminated"])
             for r in decontaminate(corpus, bench).collect()}
    hashed = {(r["doc_id"], r["n_grams"], r["n_hits"], r["contaminated"])
              for r in decontaminate(corpus, bench, hashed=True).collect()}
    assert exact == hashed


def test_decontaminate_min_hits_threshold(spark, contam_corpus):
    corpus, bench = contam_corpus
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(corpus, bench, min_hits=3).collect()}
    assert not out[2], "2 hits < min_hits=3"
    assert out[3], "4 hits >= 3"


def test_decontaminate_probe_broadcasts_not_shuffles(spark, contam_corpus):
    """The benchmark gram set must reach the corpus as a broadcast —
    a shuffle join here would reshuffle the whole corpus at scale."""
    corpus, bench = contam_corpus
    plan = decontaminate(corpus, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- repetition signals


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"),        # 2-grams: ab ba ab ba -> 4 slots, 2 distinct
         (2, "w x y z"),          # all distinct
         (3, "solo"),             # 1 token: no 2-grams
         (4, "go go go go"),      # gg gg gg -> top frac 1.0
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["n_ngrams"] == 4 and out[1]["n_distinct"] == 2
    assert out[1]["dup_ngram_frac"] == pytest.approx(0.5)
    assert out[1]["top_ngram_frac"] == pytest.approx(0.5)
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == pytest.approx(1 / 3)
    assert out[3]["n_ngrams"] == 0
    assert out[3]["dup_ngram_frac"] is None, "no gram slots -> no signal"
    assert out[4]["dup_ngram_frac"] == pytest.approx(2 / 3)
    assert out[4]["top_ngram_frac"] == pytest.approx(1.0)


def test_repetition_signals_gopher_filter_shape(spark, sf_dir):
    """Usable as the published filter: thresholding yields a subset,
    and every fixture doc reports exactly once."""
    from pandas_rust_algos_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = repetition_signals(docs)
    n_docs = docs.count()
    assert sig.count() == n_docs
    kept = sig.where(F.col("dup_ngram_frac") <= 0.8).count()
    assert 0 < kept <= n_docs


# ------------------------------------------------- domain mix sampling


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [(i, "web") for i in range(600)] \
        + [(i + 1000, "code") for i in range(100)] \
        + [(i + 2000, "books") for i in range(300)]
    return spark.createDataFrame(rows, "id long, domain string")


def test_domain_mix_hits_target_proportions(spark, mixed):
    # code is the binding domain: T = 100/0.25 = 400
    kept = domain_mix_sample(
        mixed, "domain", "id", {"web": 0.6, "code": 0.25, "books": 0.15})
    counts = {r["domain"]: r["n"] for r in
              kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts["code"] == 100, "binding domain keeps everything"
    # md5 acceptance is binomial around the target; exact thresholds
    # make the *fraction* exact, membership sampling adds +-smallish
    assert abs(counts["web"] - 240) < 40
    assert abs(counts["books"] - 60) < 20


def test_domain_mix_drops_unweighted_and_is_deterministic(spark, mixed):
    w = {"web": 0.5, "books": 0.5}
    kept = domain_mix_sample(mixed, "domain", "id", w)
    assert kept.where(F.col("domain") == "code").count() == 0
    a = sorted(r["id"] for r in kept.collect())
    b = sorted(r["id"] for r in
               domain_mix_sample(mixed.repartition(7), "domain", "id", w)
               .collect())
    assert a == b, "membership must not depend on partitioning"


def test_domain_mix_rejects_bad_weights(spark, mixed):
    with pytest.raises(ValueError):
        domain_mix_sample(mixed, "domain", "id", {"web": -1.0, "code": 2.0})
    with pytest.raises(ValueError):
        domain_mix_sample(mixed, "domain", "id", {"web": 0.0})


def test_domain_mix_plan_has_no_collect_and_broadcasts(spark, mixed):
    """Thresholds are computed in-plan: the final plan contains the
    count aggregate + broadcast joins, and building the DataFrame
    triggers no job (nothing is collected at plan time)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    kept = domain_mix_sample(
        mixed, "domain", "id", {"web": 0.6, "code": 0.25, "books": 0.15})
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction ran a Spark job"
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dsir_weights_prefer_target_like_docs(spark):
    """A raw doc written in the target's vocabulary outscores one
    written in raw-only vocabulary; gram-less docs score exactly 0."""
    import pytest as _pytest

    from pandas_rust_algos_spark.operators.dsir import dsir_log_weights

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog")
         for i in range(5)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "the quick brown fox jumps again and again today"),
         (2, "zzz qqq www eee rrr ttt yyy uuu iii ooo"),
         (3, "solo")],  # 1 token -> no bigrams
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dsir_log_weights(raw, target, n=2, buckets=256).collect()}
    assert len(got) == 3
    assert got[1]["log_weight"] > got[2]["log_weight"]
    assert got[1]["log_weight"] > 0  # target-like: likelier under p
    assert got[3]["log_weight"] == 0.0 and got[3]["n_grams"] == 0

    with _pytest.raises(ValueError):
        dsir_log_weights(raw, target, buckets=1)


def test_decontaminate_semantic_planted(spark):
    """A corpus row that is a near-copy of a benchmark row is flagged
    with that row as nearest; an orthogonal row is not; NULL vectors
    drop; threshold validation raises."""
    import numpy as np
    import pytest as _pytest

    from pandas_rust_algos_spark.operators.decontam import (
        decontaminate_semantic,
    )

    rng = np.random.default_rng(11)
    a = rng.normal(size=8)
    ortho = np.zeros(8); ortho[0] = 0.0; ortho[1] = 1.0
    base = a / np.linalg.norm(a)
    bench = spark.createDataFrame(
        [(100, [float(x) for x in base]),
         (101, [float(x) for x in rng.normal(size=8)])],
        "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(1, [float(x) for x in base + 0.001]),
         (2, [float(x) for x in ortho]),
         (3, None)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in decontaminate_semantic(
        corpus, bench, id_col="vec_id", threshold=0.95).collect()}
    assert set(got) == {1, 2}  # NULL vector dropped
    assert got[1]["contaminated"] is True
    assert got[1]["nearest_bench_id"] == 100
    assert got[2]["contaminated"] is False

    with _pytest.raises(ValueError):
        decontaminate_semantic(corpus, bench, threshold=1.5)


def test_decontaminate_semantic_empty_benchmark_twins_agree(spark):
    """EMPTY benchmark: the Spark branch returns every corpus row with
    max_cosine=-2.0/contaminated=false, and the r8-fixed SQL twin
    (LEFT JOIN from the corpus, not a bare CROSS JOIN) matches —
    previously the twin yielded ZERO rows on this edge (r7 ADVICE)."""
    import duckdb
    import pandas as pd

    from pandas_rust_algos_spark.operators.decontam import (
        decontaminate_semantic,
        sql_decontaminate_semantic,
    )

    corpus = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    got = decontaminate_semantic(
        corpus, bench, id_col="vec_id").toPandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert list(got["vec_id"]) == [1, 2]
    assert (got["max_cosine"] == -2.0).all()
    assert (~got["contaminated"]).all()
    assert got["nearest_bench_id"].isna().all()

    con = duckdb.connect()
    con.register("corpus_t", pd.DataFrame(
        {"vec_id": [1, 2, 3],
         "embedding": [[0.5, 0.5], [1.0, 0.0], None]}))
    con.register("bench_t", pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"),
         "embedding": pd.Series([], dtype="object")}))
    sql = sql_decontaminate_semantic(
        "(SELECT * FROM corpus_t)", "(SELECT * FROM bench_t)",
        id_col="vec_id")
    want = con.execute(sql).df().sort_values("vec_id").reset_index(
        drop=True)
    assert list(want["vec_id"]) == [1, 2]
    assert (want["max_cosine"] == -2.0).all()
    assert (~want["contaminated"]).all()
    assert want["nearest_bench_id"].isna().all()


def test_exact_blas_guard_raises_out_of_range(spark):
    """check_exact_blas rejects inputs whose micro-unit magnitude
    breaks float64-matmul exactness (silent hash divergence before the
    r8 guard); in-range inputs pass."""
    import pytest as _pytest

    from pandas_rust_algos_spark.operators.decontam import (
        decontaminate_semantic,
    )
    from pandas_rust_algos_spark.operators.kmeans import check_exact_blas

    check_exact_blas(1.2e6, 64, "ok")  # |x| ~ 1.2 at dim 64: fine
    with _pytest.raises(ValueError, match="exact-BLAS precondition"):
        check_exact_blas(1.2e7, 64, "too big")
    with _pytest.raises(ValueError, match="exact-BLAS precondition"):
        check_exact_blas(6e6, 64, "distance form", factor=4)

    big = 20.0  # quantizes to 2e7 micro-units > the dim-64 bound
    bench = spark.createDataFrame(
        [(100, [big] * 64)], "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(1, [0.1] * 64)], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="exact-BLAS precondition"):
        decontaminate_semantic(corpus, bench, id_col="vec_id")
