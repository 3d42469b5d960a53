"""Named query registry — the single source of truth for the driver
contract (``__spark_entry__.py``) and for ``bench.py``.

Every implemented operator from SURVEY §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) plus, when the semantics
are SQL-expressible, the equivalent DuckDB oracle SQL. The driver runs
both at sf0.01 and hash-compares row sets.

Determinism contract for oracle-checked queries
-----------------------------------------------
The hash compare is bit-level, so float results must be *identical*,
not approximately equal, between a 32-way parallel Spark run and a
single-threaded DuckDB run. Rules used throughout:

1. Sums of doubles accumulate exactly in fixed-point micro-units
   (floor(x·1e6) as long — exact + associative ⇒ partitioning-
   independent, and as fast as a double sum; the decimal(28,6)
   alternative is ~5× slower through BigDecimal). Helper: :func:`dsum`
   mirrors ``functions.na.fixed_sum`` on the SQL side.
2. Scalar double arithmetic (per-row expressions, final divisions) is
   IEEE-deterministic when both sides evaluate the same expression
   tree — oracle SQL is written to match the Spark expression shape,
   with float literals cast to DOUBLE (DuckDB parses bare ``0.25`` as
   DECIMAL, which would diverge).
3. ``pow`` is avoided (not correctly-rounded, engine-dependent);
   ``x*sqrt(x)`` replaces ``x^1.5``.
4. Where a small engine-side rounding difference is inherent
   (log/exp cumprod, interpolated quantiles, cosine), both sides round
   to 6 decimals; buckets are sized so representation error cannot
   straddle a boundary in practice.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator: register a named query with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's correctness gate samples the FIRST ~50 registry entries per
# round. Rounds 1+2 covered 100 of 118 gates; this list front-loads (a) the
# 18 gates that had never received a driver CORRECTNESS row, (b)
# events_sessionize (oracle fixed in r2, needs a driver re-check), (b2) the
# gates added in round 3 — 62 never-checked gates total, so positions 51+
# roll into round 4's window: after reading CORRECTNESS_r03, move its green
# rows out of the head and front-load the remainder — and (c) gates of
# modules changed in r2/r3 (dedup/similarity/asof/multimodal/ewm/grouped_agg).
_GATE_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked
    "asof_join_forward",
    "asof_join_nearest",
    "fuzzy_join",
    "q11_important_parts",
    "q12_late_priority",
    "q13_order_distribution",
    "q16_supplier_parts",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "snapshot_diff",
    "train_val_split",
    "stratified_sample",
    "chunk_documents",
    "embedding_near_dupes",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_features",
    "pack_sequences",
    # (b) driver re-check after r2 oracle fix
    "events_sessionize",
    # (b2) new in round 3 — never driver-checked, fresh code first
    # (all verified this session against the in-repo driver-mimicking
    # oracle sim, tools/driver_sim.py, before registration here)
    "decontaminate",
    "repetition_signals",
    "domain_mix_sample",
    "events_funnel",
    "events_cohort_retention",
    "pii_scrub",
    "url_domains",
    "quality_filter",
    "shard_assign",
    "tfidf_topterms",
    "inverted_index",
    "dedup_keep_canonical",
    "events_stream_dedup",
    "token_budget_sample",
    "embedding_quantize",
    "events_attribution",
    "group_winsorize",
    "events_session_paths",
    "profile_lineitem",
    "bigram_lm",
    "matview_incremental",
    "ann_pq_topk",
    "events_stream_funnel",
    "bpe_token_stats",
    "events_variant_props",
    "expectations_report",
    "curate_pipeline",
    "events_resample_5m",
    "udtf_pii_spans",
    "pagerank_suppliers",
    "scd2_join",
    "events_anomaly",
    "basket_pairs",
    "try_functions",
    "drift_report",
    "window_rank_suite",
    "grouping_sets_revenue",
    "pii_mask",
    "events_cusum",
    "recursive_cte_tree",
    "map_functions",
    "webdataset_export",
    "group_by_all",
    "ann_index_topk",
    "events_stream_cusum",
    "ab_test_readout",
    "date_interval_functions",
    "string_functions_ext",
    # (c) modules changing this round
    "minhash_near_dupes",
    "simhash_fingerprints",
    "dup_clusters",
    "dedup_exact",
    "ngram_jaccard",
    "cosine_topk",
    "group_ewm_mean",
    "group_ewm_mean_noskip",
    "group_ewm_mean_recursive",
    "group_ewm_var_std",
    "asof_join",
    # (c) grouped_agg gates last driver-checked in r1, module changed in r2
    "group_sum",
    "group_sum_mincount",
    "group_prod",
    "group_mean",
    "group_var_std_sem",
    "group_skew",
    "group_median",
    "group_quantile_linear",
    "group_quantile_lower",
    "group_quantile_higher",
    # (nearest/midpoint re-checks yield window slots to the round-3
    # funnel/cohort gates — r1-green, shared rank-window plan with the
    # three variants kept above, in-repo parity still covers them)
    "group_min_max",
    "group_first_last",
    # (r1-green group_nth / group_first_last_string / group_ohlc yield
    # their window slots to the round-3 gates above; the r2 module
    # change — histogram clamp — never touched their code paths, and
    # tests/test_oracle_parity.py keeps them green in-repo)
    "group_any_all",
    "group_any_all_kleene",
    "group_histogram",
)


def _load_all() -> None:
    """Import every query module so registrations run, then rotate the
    registry so :data:`_GATE_PRIORITY` names come first (idempotent).

    Registration order IS the order the driver's correctness gate walks
    the registry, and the driver truncates at ~50 queries/round — so the
    priority rotation, not import order, decides which gates get a
    CORRECTNESS row this round.
    """
    from pandas_rust_algos_spark.plans import queries_window  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_relational  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_groupby  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_events  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_functions  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_llmdata  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_scrub  # noqa: F401
    from pandas_rust_algos_spark.plans import queries_pipeline  # noqa: F401

    ordered = {n: _REGISTRY[n] for n in _GATE_PRIORITY if n in _REGISTRY}
    if len(ordered) < len(_REGISTRY):
        ordered.update({n: s for n, s in _REGISTRY.items() if n not in ordered})
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


# ---------------------------------------------------------------- SQL helpers


def dsum(expr: str) -> str:
    """Oracle-side deterministic sum — fixed-point micro-units, the SQL
    twin of ``functions.na.fixed_sum`` (see module docstring rule 1;
    1e6 written in scientific notation so DuckDB parses a DOUBLE, not a
    DECIMAL literal)."""
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6"
