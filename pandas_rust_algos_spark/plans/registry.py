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

# Plan-snapshot probes: a gate that must return a localCheckpoint'd
# DataFrame (e.g. to pin a conf-scoped plan before restoring the conf)
# records its PRE-checkpoint DataFrame here so tools/snapshot_plans.py
# can show the real join/exchange structure instead of the degenerate
# `Scan ExistingRDD` the checkpoint leaves behind. Keyed by gate name;
# consumed (popped) by the snapshot tool right after running the gate.
PLAN_PROBES: dict[str, DataFrame] = {}


def record_plan_probe(name: str, df: DataFrame) -> None:
    """Stash the pre-checkpoint DataFrame for plan snapshotting. The
    caller must have EXECUTED it already (eager localCheckpoint does)
    so its QueryExecution holds the finalized AQE plan under the confs
    that were live at execution time.

    No-op unless the snapshot tool opted in via the
    ``PRA_PLAN_PROBES`` env var: bench/driver runs invoke the probed
    gates repeatedly, and an unconsumed probe would pin each run's
    JVM QueryExecution (plan + stats) for process lifetime."""
    import os

    if os.environ.get("PRA_PLAN_PROBES"):
        PLAN_PROBES[name] = df


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator: register a named query with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's correctness gate samples the FIRST ~50 registry entries per
# round. Every gate has at least one driver CORRECTNESS row (zero reds ever);
# staleness is the only dimension. Round 8 front-loads (a) gates NEW in
# round 8 plus gates whose modules changed in round 8 (ADVICE fixes:
# ann_portable k-clamp/dims-probe/exact-BLAS guard, dsir driver-side logs,
# decontam empty-benchmark twin, semdedup guard, dedup whale-bucket cap),
# then (b) the 5 gates whose newest driver row is still r2, then (c) the 43
# r3-era gates oldest-first (VERDICT r7 next-#2) — the driver window
# truncates at ~50; next round resumes from whatever is left.
_GATE_PRIORITY: tuple[str, ...] = (
    # (a) new in round 8 / modules changed in round 8
    "ann_ivfpq_topk_portable",  # new: composed IVF+PQ retrieval (r7 #4)
    "unigram_lm_learn",        # new: SentencePiece-style trainer (r7 #5)
    "unigram_encode_counts",   # new: unigram encode surface (r8)
    "ann_ivfpq_index_read",    # new: persisted IVF+PQ code table (r8)
    "ann_ivfpq_topk",          # new: float composed default, rows-only (r8)
    "minhash_near_dupes_capped",  # new: whale-bucket guard (r7 #6)
    "ann_ivf_topk_portable",   # ann_portable.py k-clamp + guard (ADVICE r7)
    "ann_pq_topk_portable",    # ann_portable.py dims probe (ADVICE r7)
    "dsir_weights",            # dsir.py driver-side libm logs (ADVICE r7)
    "decontam_semantic",       # decontam.py twin edge + guard (ADVICE r7)
    "semantic_dedup",          # semdedup.py exact-BLAS guard (ADVICE r7)
    "minhash_near_dupes",      # dedup.py whale-bucket cap wiring (r7 #6)
    "group_winsorize",         # grouped_transform sf1-ratio work (r7 #7)
    # (b) newest driver row is r2-era
    "rolling_time_1h",
    "rolling_time_1h_closed_right",
    "take_1d",
    "take_2d",
    "topk_per_group",
    # (c) newest driver row is r3-era, oldest-first
    "asof_join_forward",
    "asof_join_nearest",
    "bigram_lm",
    "bpe_token_stats",
    "chunk_documents",
    "curate_pipeline",
    "decontaminate",
    "dedup_keep_canonical",
    "embedding_quantize",
    "events_attribution",
    "events_cohort_retention",
    "events_funnel",
    "events_resample_5m",
    "events_session_paths",
    "events_sessionize",
    "events_stream_dedup",
    "events_stream_funnel",
    "events_variant_props",
    "fuzzy_join",
    "inverted_index",
    "media_features",
    "pack_sequences",
    "pagerank_suppliers",
    "pii_scrub",
    "profile_lineitem",
    "q11_important_parts",
    "q12_late_priority",
    "q13_order_distribution",
    "q16_supplier_parts",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "quality_filter",
    "repetition_signals",
    "scd2_join",
    "shard_assign",
    "snapshot_diff",
    "stratified_sample",
    "tfidf_topterms",
    "token_budget_sample",
    "train_val_split",
    "udtf_pii_spans",
    "url_domains",
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
