"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints a full-name record line, then the OFFICIAL final JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {abbrev: ms_int, ...}, "legend": ..., "sf": ...}

The driver tail-captures only the last ~2000 chars of stdout and
parses the FINAL line — the 92-query full-name dict outgrew that
window at round 6 (BENCH_r06/r07 ``parsed: null``, silently dropping
the first ~40 queries from the official record — r7 VERDICT next-#1).
So the final line uses deterministic initials abbreviations (unique
per HEADLINE, digits preserved: ``q1_pricing_summary → q1ps``) and
integer milliseconds; ``abbrev_names()`` is the single source of the
mapping, the expansion legend is persisted in ``BENCH_RUNS.json``
alongside the raw runs, the full-name seconds dict still prints on
the line BEFORE the final one (humans + logs), and a unit test pins
``len(final_line) < 1900`` at worst-case value widths.

Each query is forced end-to-end with a noop-format write (full
computation on executors, nothing collected to the driver), after a
warmup run of the flagship to exclude JVM/codegen warmup from steady-
state numbers.

Host-epoch hardening (r10 post-mortem, protocol fixed per r11
ADVICE): the official r10 capture landed in a contended host window
and posted the r1-era 18-query contract basket at 2.22x of r1 while
three same-code runs measured 1.11x — uniform inflation on
byte-identical plans. Basket queries therefore run a SECOND pass of
2 runs after the last suite query. The r11 protocol took the
per-query MIN across both passes (best-of-5) — but the r1 baseline
the ratio is judged against was best-of-3, and min over more samples
is biased downward as an order statistic regardless of host noise,
so the OFFICIAL per-query number is now the FIRST-pass best-of-3
(same protocol as r1 and as every non-basket query); the second pass
is recorded in BENCH_RUNS.json as ``basket_pass2`` (raw runs) +
``basket_min_bo5`` (the cross-check min) so a contended first pass
is still detectable and attributable, without flattering the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandas_rust_algos_spark.plans import registry
from pandas_rust_algos_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "group_sum",
    "group_quantile_linear",
    "group_cumsum",
    "group_rank",
    "asof_join",
    "topk_per_group",
    "events_tumbling_1h",
    "dedup_exact",
    "token_stats",
    "minhash_near_dupes",
    "cosine_topk",
    "group_describe",
    "rolling_time_1h",
    "heavy_hitters",
    "fuzzy_join",
    # round 3: training-pipeline additions
    "decontaminate",
    "repetition_signals",
    "domain_mix_sample",
    "pii_scrub",
    "quality_filter",
    "tfidf_topterms",
    "events_attribution",
    "group_winsorize",
    # round 3b: pipeline-infrastructure additions
    "expectations_report",
    "curate_pipeline",
    "events_resample_5m",
    "pagerank_suppliers",
    "scd2_join",
    "events_anomaly",
    "basket_pairs",
    "drift_report",
    "window_rank_suite",
    "grouping_sets_revenue",
    "pii_mask",
    "events_cusum",
    "map_functions",
    "webdataset_export",
    # round 4: compressed-codec decode, frame windows, stream join, BFS
    "png_media_features",
    "window_frames",
    "events_stream_join",
    "graph_shortest_hops",
    "interval_merge",
    "doc_lm_score",
    "bloom_join_revenue",
    # round 5: lakehouse merge-on-read deletion-vector read path,
    # BM25 retrieval, salted skew join, exact regression aggregates,
    # from-scratch lossless-JPEG codec path
    "delete_mor_read",
    "bm25_topk",
    "skew_join_salted",
    "regr_aggregates",
    "jpeg_media_features",
    # round 5b: lakehouse MoR update + CDF, bucketed co-located join,
    # G.711 mu-law codec path
    "mulaw_media_features",
    "bucketed_join_revenue",
    "update_mor_read",
    "table_cdf_read",
    # round 5c: MERGE INTO, format sinks, Z-order codes, schema evolution
    "merge_upsert_read",
    "formats_roundtrip",
    "zorder_codes",
    "schema_evolution_read",
    "bpe_learn_merges",
    "restore_read",
    "bpe_encode_tokens",
    "triangle_count",
    "listagg_top_customers",
    "cms_heavy_hitters",
    "hll_nunique_orders",
    "events_stream_cms",
    "cms_incremental_merge",
    "hll_incremental_merge",
    # round 6: substring-level exact dedup (Lee et al. duplicated spans),
    # KMV/theta sketches (distinct counting + set algebra)
    "dup_spans",
    "kmv_nunique_orders",
    "kmv_set_ops_customers",
    "events_stream_hll",
    "hist_quantiles_prices",
    "dup_spans_strip",
    "hashing_features",
    "decontam_spans",
    "tiff_media_features",
    "token_drift_kl",
    "kmeans_clusters",
    "stratified_top_n",
    # round 7: oracle-able fixed-point ANN (IVF cells, PQ/ADC codes)
    "ann_ivf_topk_portable",
    "ann_pq_topk_portable",
    "semantic_dedup",
    # HEADLINE keeps the r11 official key (gasb): the oracled bounds
    # report gained the driver-facing alias ``group_approx_stats``
    # (r11 VERDICT #6) but the bench record never renames a key.
    "group_approx_stats_bounds",
    "wordpiece_learn",
    "heavy_hitters_approx_bounds",
    "dsir_weights",
    "wav_media_features",
    "hard_negatives",
    "decontam_semantic",
    # round 8: composed IVF+PQ retrieval (coarse cells prune, residual
    # PQ-ADC scores probed cells only), unigram-LM tokenizer trainer
    "ann_ivfpq_topk_portable",
    "unigram_lm_learn",
    "minhash_near_dupes_capped",
    "unigram_encode_counts",
    # round 9: exact shortlist rerank on the portable IVF+PQ path,
    # incremental dedup through a persisted minhash signature store
    "ann_ivfpq_rerank_topk",
    "minhash_store_incremental",
    # round 9 (cont.): hybrid retrieval + weighted sampling + bloom
    # screening
    "hybrid_rrf_topk",
    "mmr_diversify_topk",
    "priority_sample_weighted",
    "decontam_bloom",
    "bm25_batch_topk",
    "decontam_bloom_store",
    "group_robust_zscore",
    "retrieval_pipeline_e2e",
    "kfold_assign",
    "docs_stream_bloom_screen",
    "priority_sample_stratified",
    "dedup_soft_weights",
    # round 10: streaming signature-store ingest, oracled float-ANN
    # recall bounds
    "minhash_store_stream_ingest",
    "ann_float_recall_bounds",
    # round 10 (cont.): weighted grouped aggregations + the soft-dedup
    # composition
    "group_weighted_stats",
    "group_weighted_quantile",
    "dedup_weighted_stats",
    "jsonl_quarantine_read",
    "group_weighted_quantiles_multi",
    "docs_stream_quarantine_land",
    # round 11: mergeable approximate weighted quantile, streaming IVF
    # index ingest, weighted-quantile → packing-budget composition
    "group_weighted_quantile_approx",
    "ann_index_stream_append",
    "pack_budget_weighted",
    "events_stream_hist",
    "pack_budget_weighted_approx",
    "group_weighted_corr",
    # round 12: mergeable 2-D weighted corr sketch, streaming KMV store,
    # streaming per-window correlation
    "group_weighted_corr_approx",
    "corr_weighted_incremental_merge",
    "events_stream_kmv",
    "events_stream_corr",
]

# The r1-era contract basket: the 18 queries whose aggregate the judge
# holds to <=2x of the BENCH_r01 record. They lead HEADLINE, so the
# main loop measures them at suite start (the OFFICIAL best-of-3);
# main() re-measures them after the last query as a recorded
# contention cross-check only (see module docstring).
CONTRACT_BASKET = HEADLINE[:18]
assert CONTRACT_BASKET[0] == "q1_pricing_summary"
assert CONTRACT_BASKET[-1] == "fuzzy_join"


def abbrev_names(names: list[str] | None = None) -> dict[str, str]:
    """name → unique short key: the initial of every ``_``-token with
    digits kept (``group_approx_stats → gas``,
    ``q1_pricing_summary → q1ps``); collisions get ``2``, ``3``, … in
    list order. Deterministic for a fixed HEADLINE, so the official
    record's keys are stable across runs of the same round."""
    out: dict[str, str] = {}
    used: set[str] = set()
    for name in (HEADLINE if names is None else names):
        base = "".join(
            tok[0] + "".join(ch for ch in tok[1:] if ch.isdigit())
            for tok in name.split("_") if tok
        )
        cand, i = base, 1
        while cand in used:
            i += 1
            cand = f"{base}{i}"
        used.add(cand)
        out[name] = cand
    return out


def final_record_line(times: dict[str, float], sf: str) -> str:
    """The compact OFFICIAL final stdout line (abbrev keys, ms ints)."""
    ab = abbrev_names()
    return json.dumps({
        "metric": "headline_suite_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {ab[n]: int(round(t * 1000)) for n, t in times.items()},
        "legend": "BENCH_RUNS.json abbrev",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }, separators=(",", ":"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _release_caches(spark) -> None:
    """Free every query-scoped cache and assert none survived (r12
    VERDICT #1/#7). Runs AFTER each timed run's clock stops: the timed
    region stays exactly the build-round methodology (construct the
    plan + materialize through the noop sink), while run 2 of a
    best-of-3 now recomputes from the parquet inputs — Spark's
    CacheManager matches canonicalized plans, so without the release
    every re-built identical DataFrame silently reused the previous
    run's InMemoryRelation and the best-of-N minimum timed a
    warm-cache run. The emptiness assert makes any future persist-leak
    fail loudly instead of contaminating minima. The SQL CacheManager
    (not getPersistentRDDs) is the right thing to check: cross-run
    reuse happens only through plan-fingerprint matching there, while
    localCheckpoint RDDs are invocation-private and GC-reclaimed."""
    from pandas_rust_algos_spark import cachelife

    cachelife.release()
    try:
        empty = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    except Exception:
        return  # introspection is best-effort; release() already ran
    if not empty:
        raise SystemExit(
            "cache-hygiene violation: the SQL CacheManager is non-empty "
            "after cachelife.release() — some query path persisted a "
            "frame without cachelife.track() or an inline unpersist()")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Subset override for attribution experiments (e.g. "do the r1-era
    # queries regress because of plans, or because of suite position /
    # JVM pressure at 71 queries?"): run an isolated slice in a fresh
    # session and compare against the full-suite numbers.
    headline = HEADLINE
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in HEADLINE]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY names not in HEADLINE: "
                             f"{unknown}")
        headline = names
    spark = get_spark("pra-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen, plus file listing/footer caches for every
    # table the suite touches — the measured numbers are steady-state
    # query latency (what a long-lived cluster sees), not first-contact
    # metadata costs
    from pandas_rust_algos_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    _force(registry.get("q1_pricing_summary").fn(spark, sf_dir))
    _release_caches(spark)

    # best-of-3 per query, raw runs preserved: the first run of a plan
    # shape pays one-time whole-stage-codegen compilation (measured
    # 3-6x steady-state), and this host shows ~2x run-to-run VM noise —
    # the best is the repeatable latency, the raw runs make any
    # round-over-round regression attributable (noise vs real)
    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in headline:
        fn = registry.get(name).fn
        rs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 3))
            _release_caches(spark)
        runs[name] = rs
        times[name] = min(rs)

    # contract-basket second pass (full-suite runs only): +2 runs per
    # basket query at the END of the suite window, recorded as a
    # contention CROSS-CHECK only — the official times[] stays the
    # first-pass best-of-3 so the judged ratio uses the same order
    # statistic as the r1 baseline record (module docstring; r11
    # ADVICE: best-of-5 min is biased downward vs a best-of-3
    # baseline regardless of host noise)
    basket_pass2: dict[str, list[float]] = {}
    if not only:
        for name in CONTRACT_BASKET:
            fn = registry.get(name).fn
            p2 = []
            for _ in range(2):
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                p2.append(round(time.perf_counter() - t0, 3))
                _release_caches(spark)
            basket_pass2[name] = p2

    total = round(sum(times.values()), 3)
    # Raw per-run samples and the abbrev legend go to a side file, NOT
    # the summary line: the driver tail-captures ~2000 chars of stdout
    # and parses the final JSON line, and the full-name per-query dict
    # outgrew that window at 41 queries (r3) and again at 92 (r6/r7,
    # parsed:null). Keep the last stdout line compact and final.
    if only:
        # subset runs print their raw triples instead of touching the
        # side files, so attribution/merge work gets real samples
        print(json.dumps({"metric": "headline_suite_raw_runs",
                          "runs": runs, "sf": sf},
                         separators=(",", ":")))
    if not only:  # subset runs must not clobber the full-suite record
        # non-default SFs (sf1 rehearsals) get their own side file so
        # a rehearsal cannot clobber the driver-scale sf0.1 record
        name = ("BENCH_RUNS.json" if sf == "0.1"
                else f"BENCH_RUNS_sf{sf}.json")
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    name), "w") as f:
                json.dump({"sf": sf, "runs": runs,
                           "basket_pass2": basket_pass2,
                           "basket_min_bo5": {
                               n: min(runs[n] + basket_pass2[n])
                               for n in basket_pass2},
                           "abbrev": abbrev_names()}, f)
        except OSError:
            pass
    # full-name record for humans/logs (NOT the official last line)
    print(json.dumps({
        "metric": "headline_suite_total_fullnames",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }, separators=(",", ":")))
    print(final_record_line(times, sf))


if __name__ == "__main__":
    main()
