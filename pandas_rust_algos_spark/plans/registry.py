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
# round. r1∪r2∪r3 covered 149 of 166 gates, zero reds outstanding. Round 4
# front-loads (a) the 17 gates that have never received a driver CORRECTNESS
# row (positions 51+ of round 3's list), (b) gates NEW in round 4, (c)
# re-checks for modules changed in round 4 (drift, validate, table_format,
# similarity), and (d) r1-green gates that yielded their window slots in
# r2/r3 and have not been driver-checked since.
_GATE_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked — the round-3b tail
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
    # (b) new in round 4 — inserted as they are authored
    "png_media_features",
    "events_stream_join",
    "window_frames",
    "graph_shortest_hops",
    "pack_sequences_sharded",
    "ann_lsh_topk",  # oracle promoted this round (full LSH replay)
    "events_stream_tumbling",  # oracle promoted (== batch hourly agg)
    "events_stream_sessions",  # oracle promoted (>=gap islands twin)
    "events_stream_enrich",
    "gif_media_features",
    "interval_merge",
    "doc_lm_score",
    "minhash_near_dupes_portable",
    "simhash_fingerprints_portable",
    "bloom_join_revenue",
    # (c) modules changed in round 4 → driver re-verification
    "matview_incremental",
    "expectations_report",
    "ann_ivf_topk",
    "ann_pq_topk",
    "cosine_topk",
    "embedding_near_dupes",
    "domain_mix_sample",
    # (d) r1-green gates that yielded window slots in r2/r3, never
    # re-checked since (in-repo parity keeps them green meanwhile)
    "group_quantile_nearest",
    "group_quantile_midpoint",
    "group_nth",
    "group_first_last_string",
    "group_ohlc",
    "q2_min_cost_supplier",
    "q4_priority_orders",
    "q6_forecast_revenue",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "range_join",
    "semi_anti_join",
    "set_ops",
    "distinct_agg",
    "rollup_revenue",
    "cube_revenue",
    "group_pivot",
    "group_melt",
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
