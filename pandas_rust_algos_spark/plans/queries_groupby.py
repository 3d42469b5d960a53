"""Gate queries for the grouped-reduction operators (SURVEY §2.1 rows
4-16) over the driver fixtures, each paired with DuckDB oracle SQL.

Two flavors appear on purpose:

- operators whose native Spark form is already value-deterministic
  (count/min/max/first/last/nth/ohlc/any_all/median/quantile picks) go
  through the operator library directly;
- float reductions (sum/mean/var/std/sem/skew) use the deterministic
  decimal-accumulation form on BOTH sides (registry docstring, rule 1),
  so the 32-way-parallel Spark result hashes identically to the
  single-threaded oracle. The native forms (``F.avg``, ``F.var_samp``,
  ...) are unit-tested against DuckDB with numeric tolerance in
  ``tests/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import grouped_agg as ga
from pandas_rust_algos_spark.operators import weighted as wt
from pandas_rust_algos_spark.plans.registry import dsum, register
from pandas_rust_algos_spark.session import tune
from pandas_rust_algos_spark.sources import load_table


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "lineitem")


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a deterministic nullable value column (the fixtures
    have no NULLs; NA-handling paths need some)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "v", F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    )


_EV_V = "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END"


def _exact(col):
    """fixed-point deterministic sum (twin of registry.dsum)."""
    return F.sum(F.floor(col * F.lit(1e6)).cast("long")).cast("double") / F.lit(1e6)


# --------------------------------------------------------------- group_count


@register(
    "group_count",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counts out-array (`lib.rs:775-778`)."""
    li = _li(spark, sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("l_quantity").alias("n_qty")
    )


# ----------------------------------------------------------------- group_sum


@register(
    "group_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           {dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_sum (`groupby.rs:846-907`) — exact fixed-point accumulation."""
    li = _li(spark, sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _exact(F.col("l_quantity")).alias("sum_qty"),
        _exact(F.col("l_extendedprice")).alias("sum_base_price"),
        _exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
    )


# ---------------------------------------------------------------- group_mean


@register(
    "group_mean",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} / COUNT(l_quantity) AS avg_qty,
           {dsum('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
           {dsum('l_discount')} / COUNT(l_discount) AS avg_disc
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_mean (`groupby.rs:1271-1403`) as exact-sum / count."""
    li = _li(spark, sf_dir)

    def mean(c):
        return _exact(F.col(c)) / F.count(F.col(c))

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        mean("l_quantity").alias("avg_qty"),
        mean("l_extendedprice").alias("avg_price"),
        mean("l_discount").alias("avg_disc"),
    )


# ---------------------------------------------------------- min_count gate


@register(
    "group_sum_mincount",
    oracle=f"""
    WITH e AS (SELECT event_type, {_EV_V} AS v FROM events)
    SELECT event_type,
           CASE WHEN COUNT(v) >= 500 THEN {dsum('v')} END AS sum_mc500,
           CASE WHEN COUNT(v) >= 1000000 THEN {dsum('v')} END AS sum_mc_huge
    FROM e GROUP BY event_type
    """,
)
def group_sum_mincount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_count semantics (`check_below_mincount`, `groupby.rs:788-843`):
    groups with fewer than min_count non-null observations yield NULL —
    exercised at a threshold some groups miss and one nothing meets."""
    ev = _ev(spark, sf_dir)
    c = F.col("v")
    fx = F.sum(F.floor(c * F.lit(1e6)).cast("long")).cast("double") / F.lit(1e6)
    return ev.groupBy("event_type").agg(
        F.when(F.count(c) >= 500, fx).alias("sum_mc500"),
        F.when(F.count(c) >= 1000000, fx).alias("sum_mc_huge"),
    )


# ---------------------------------------------------------------- group_prod


@register(
    "group_prod",
    oracle="""
    SELECT l_orderkey, ROUND(PRODUCT(1 + l_discount), 6) AS prod_disc
    FROM lineitem GROUP BY l_orderkey
    """,
)
def group_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_prod (`groupby.rs:909-985`): F.product, rounded (rule 4)."""
    li = _li(spark, sf_dir).withColumn("disc1", 1 + F.col("l_discount"))
    out = ga.group_prod(li, "l_orderkey", ["disc1"])
    return out.select("l_orderkey", F.round("disc1", 6).alias("prod_disc"))


# ------------------------------------------------------------- group_min/max


@register(
    "group_min_max",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
           MIN(l_shipdate) AS min_shipdate, MAX(l_shipdate) AS max_shipdate
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_min/group_max (`groupby.rs:2039-2154`), incl. the
    datetimelike path (timestamps ride native, not i64+NaT)."""
    li = _li(spark, sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


# ------------------------------------------------------- group_var/std/sem


_VAR_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         {dsum('l_quantity')} AS s1,
         {dsum('l_quantity * l_quantity')} AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
       SQRT((s2 - s1 * s1 / n) / (n - 1)) AS std_qty,
       SQRT((s2 - s1 * s1 / n) / (n - 1)) / SQRT(n) AS sem_qty
FROM m
"""


@register("group_var_std_sem", oracle=_VAR_ORACLE)
def group_var_std_sem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_var name=var|std|sem (`groupby.rs:987-1129`, selector at
    1020-1021), ddof=1, via deterministic exact moments; masked-std bug
    (§2.4 #3) not reproduced. Native F.var_samp path unit-tested."""
    li = _li(spark, sf_dir)
    q = F.col("l_quantity")
    agged = li.groupBy("l_returnflag").agg(
        F.count(q).alias("n"),
        _exact(q).alias("s1"),
        _exact(q * q).alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return agged.select(
        "l_returnflag",
        var.alias("var_qty"),
        F.sqrt(var).alias("std_qty"),
        (F.sqrt(var) / F.sqrt(F.col("n"))).alias("sem_qty"),
    )


# ---------------------------------------------------------------- group_skew


_SKEW_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         {dsum('l_quantity')} / COUNT(l_quantity) AS m1,
         {dsum('l_quantity * l_quantity')} / COUNT(l_quantity) AS r2,
         {dsum('l_quantity * l_quantity * l_quantity')} / COUNT(l_quantity) AS r3
  FROM lineitem GROUP BY l_returnflag
), c AS (
  SELECT l_returnflag, n,
         r2 - m1 * m1 AS m2,
         r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3
  FROM m
)
SELECT l_returnflag,
       CASE WHEN n >= 3 THEN
         (SQRT(CAST(n * (n - 1) AS DOUBLE)) / (n - 2)) * (m3 / (m2 * SQRT(m2)))
       END AS skew_qty
FROM c
"""


@register("group_skew", oracle=_SKEW_ORACLE)
def group_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_skew (`groupby.rs:1131-1268`): pandas' sample-adjusted
    Fisher-Pearson from exact raw moments (x*sqrt(x), never pow — rule
    3); n<3 → NULL (`groupby.rs:1199`). §2.4 #4 bug not reproduced."""
    li = _li(spark, sf_dir)
    q = F.col("l_quantity")
    agged = li.groupBy("l_returnflag").agg(
        F.count(q).alias("n"),
        (_exact(q) / F.count(q)).alias("m1"),
        (_exact(q * q) / F.count(q)).alias("r2"),
        (_exact(q * q * q) / F.count(q)).alias("r3"),
    )
    n, m1, r2, r3 = F.col("n"), F.col("m1"), F.col("r2"), F.col("r3")
    m2 = r2 - m1 * m1
    m3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
    skew = (F.sqrt((n * (n - 1)).cast("double")) / (n - 2)) * (m3 / (m2 * F.sqrt(m2)))
    return agged.select(
        "l_returnflag", F.when(n >= 3, skew).alias("skew_qty")
    )


# -------------------------------------------------------------- group_median


@register(
    "group_median",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(MEDIAN(l_quantity), 6) AS median_qty,
           ROUND(MEDIAN(l_extendedprice), 6) AS median_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_median_float64 (`groupby.rs:114-184`; even-n averaging at
    19-25). The reference's countsort→gather→quickselect pipeline is
    Catalyst's shuffle + F.median."""
    li = _li(spark, sf_dir)
    out = ga.group_median(li, ["l_returnflag", "l_linestatus"],
                          ["l_quantity", "l_extendedprice"])
    return out.select(
        "l_returnflag", "l_linestatus",
        F.round("l_quantity", 6).alias("median_qty"),
        F.round("l_extendedprice", 6).alias("median_price"),
    )


# ------------------------------------------------------------ group_quantile


_QS = [0.0, 0.25, 0.513, 0.75, 1.0]
_QS_SQL = ", ".join(f"({q})" for q in _QS)


@register(
    "group_quantile_linear",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT l_returnflag, CAST({q} AS DOUBLE) AS q,
           ROUND(PERCENTILE_CONT({q}) WITHIN GROUP (ORDER BY l_extendedprice), 6)
             AS quantile
    FROM lineitem GROUP BY l_returnflag
    """
        for q in _QS
    ),
)
def group_quantile_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_quantile interpolation=linear (`groupby.rs:1532-1660`)."""
    li = _li(spark, sf_dir)
    out = ga.group_quantile(li, "l_returnflag", "l_extendedprice", _QS,
                            interpolation="linear")
    return out.select("l_returnflag", "q", F.round("quantile", 6).alias("quantile"))


def _quantile_mode_oracle(mode_expr: str) -> str:
    return f"""
    WITH nn AS (
      SELECT l_returnflag AS k, l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {_QS_SQL}) t(q)),
    p AS (
      SELECT k, q,
        MAX(CASE WHEN rn = CAST(FLOOR(q * (n-1)) AS BIGINT) THEN v END) AS vlo,
        MAX(CASE WHEN rn = CAST(CEIL(q * (n-1)) AS BIGINT) THEN v END) AS vhi,
        MAX(CASE WHEN q * (n-1) - FLOOR(q * (n-1)) > 0.5
                   OR (q * (n-1) - FLOOR(q * (n-1)) = 0.5 AND q > 0.5)
                 THEN 1 ELSE 0 END) AS use_hi
      FROM nn CROSS JOIN qs GROUP BY k, q
    )
    SELECT k AS l_returnflag, q, {mode_expr} AS quantile FROM p
    """


def _quantile_mode_query(mode: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = _li(spark, sf_dir)
        return ga.group_quantile(li, "l_returnflag", "l_extendedprice", _QS,
                                 interpolation=mode)

    fn.__name__ = f"group_quantile_{mode}"
    fn.__doc__ = (
        f"group_quantile interpolation={mode} — exact order statistics "
        "(`groupby.rs:1556-1562`), no builtin; composed via in-group ranks."
    )
    return fn


register("group_quantile_lower", oracle=_quantile_mode_oracle("vlo"))(
    _quantile_mode_query("lower"))
register("group_quantile_higher", oracle=_quantile_mode_oracle("vhi"))(
    _quantile_mode_query("higher"))
register("group_quantile_nearest", oracle=_quantile_mode_oracle(
    "CASE WHEN use_hi = 1 THEN vhi ELSE vlo END"))(
    _quantile_mode_query("nearest"))
register("group_quantile_midpoint", oracle=_quantile_mode_oracle("(vlo + vhi) / 2"))(
    _quantile_mode_query("midpoint"))


# ----------------------------------------------------- approx scale path


@register("group_approx_stats_raw")
def group_approx_stats_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregations — the petabyte path: HLL++ distinct
    counts (fixed sketch memory, no distinct-value shuffle) and
    approx_percentile (mergeable rank sketch, no per-group sort).
    Engine-specific sketch VALUES → rows-only check BY DESIGN (the
    ``_raw`` suffix says so); the driver-facing oracled contract for
    this family is ``group_approx_stats`` (the bounds report below),
    whose DuckDB twin pins exact counts + published-error booleans.
    Accuracy vs the exact operators is additionally asserted in
    tests/test_operators.py."""
    li = _li(spark, sf_dir)
    nun = ga.group_nunique_approx(li, "l_returnflag", ["l_partkey"])
    qa = ga.group_quantile_approx(li, "l_returnflag", "l_extendedprice",
                                  [0.5, 0.95])
    return nun.withColumnRenamed("l_partkey", "approx_nparts").join(
        qa.groupBy("l_returnflag").pivot("q", ["0.5", "0.95"])
        .agg(F.first("quantile")).withColumnsRenamed(
            {"0.5": "approx_p50", "0.95": "approx_p95"}),
        "l_returnflag",
    )


@register(
    "group_weighted_stats",
    oracle=wt.sql_group_weighted_stats(
        "lineitem", "l_returnflag", "l_discount", "l_quantity"),
)
def group_weighted_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted discount statistics per return flag: weighted
    mean AND frequency-weights variance in ONE map-side-combined
    groupBy (three fixed-point long sums wide — the cheapest shuffle
    shape). Weighted aggregation is the training-pipeline primitive
    behind soft-dedup-corrected corpus stats and quality-weighted
    mixture audits (``operators/weighted.py``, r10)."""
    li = _li(spark, sf_dir)
    return wt.group_weighted_stats(li, "l_returnflag",
                                   "l_discount", "l_quantity")


@register(
    "group_weighted_quantile",
    oracle=wt.sql_group_weighted_quantile(
        "lineitem", "l_returnflag", "l_extendedprice", "l_quantity",
        q=0.5),
)
def group_weighted_quantile_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Volume-weighted median price per return flag: smallest value
    whose cumulative micro-unit weight (value order, RANGE frame —
    ties accumulate together) reaches half the group's total. The
    left-continuous inverse-CDF rule, integer cumulative weights ⇒
    the crossing value is engine- and partitioning-independent
    (``operators/weighted.py:group_weighted_quantile``)."""
    li = _li(spark, sf_dir)
    return wt.group_weighted_quantile(
        li, "l_returnflag", "l_extendedprice", "l_quantity", q=0.5)


@register(
    "group_weighted_quantiles_multi",
    oracle=wt.sql_group_weighted_quantiles(
        "lineitem", "l_returnflag", "l_extendedprice", "l_quantity",
        qs=(0.25, 0.5, 0.9)),
)
def group_weighted_quantiles_multi(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """p25/p50/p90 volume-weighted prices in ONE pass — the
    packing-budget shape: the cumulative-weight window is computed
    once and each q is one conditional MIN over the same rows, so k
    quantiles cost one within-group sort instead of k
    (``operators/weighted.py:group_weighted_quantiles``)."""
    li = _li(spark, sf_dir)
    return wt.group_weighted_quantiles(
        li, "l_returnflag", "l_extendedprice", "l_quantity",
        qs=(0.25, 0.5, 0.9))


def _weighted_corr_oracle() -> str:
    inner = wt.sql_group_weighted_corr_cov(
        "lineitem", "l_suppkey", "l_discount", "l_tax",
        "l_extendedprice")
    # + 0.0 flushes IEEE negative zero: DuckDB's ROUND preserves -0.0
    # where Spark's emits 0.0, and repr-level hashing tells them apart
    return (f"SELECT l_suppkey, ROUND(wcorr, 6) + 0.0 AS wcorr, "
            f"ROUND(wcov, 6) + 0.0 AS wcov FROM ({inner})")


@register("group_weighted_corr", oracle=_weighted_corr_oracle())
def group_weighted_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted Pearson correlation + covariance of
    (discount, tax) per supplier — the bivariate member of the
    weighted family: six fixed-point micro-unit sums in ONE map-side-
    combined groupBy (the ``group_weighted_stats`` shuffle shape),
    finishing IEEE trees identical across engines. Fixture columns
    chosen for fixed-point headroom: Σw·y² must stay under 2^63
    micro-units per group (the ``fixed_sum`` docstring's whale rule —
    price-squared sums would overflow; discount/tax magnitudes do
    not). (``operators/weighted.py:group_weighted_corr_cov``)."""
    li = _li(spark, sf_dir)
    out = wt.group_weighted_corr_cov(
        li, "l_suppkey", "l_discount", "l_tax", "l_extendedprice")
    return out.select(
        "l_suppkey",
        (F.round("wcorr", 6) + F.lit(0.0)).alias("wcorr"),
        (F.round("wcov", 6) + F.lit(0.0)).alias("wcov"))


_WQA_ARGS = dict(lo=0.0, hi=110_000.0, bins=512)
_WQA_QS = (0.5, 0.9, 0.99)


def _weighted_quantile_approx_oracle() -> str:
    from pandas_rust_algos_spark.operators.histsketch import (
        sql_hist_sketch_weighted,
        sql_hist_weighted_quantiles,
    )

    sk = sql_hist_sketch_weighted(
        "l_returnflag", "l_extendedprice", "l_quantity", "lineitem",
        **_WQA_ARGS)
    inner = sql_hist_weighted_quantiles(sk, _WQA_QS, **_WQA_ARGS)
    return f"SELECT grp AS l_returnflag, q, est FROM ({inner})"


@register(
    "group_weighted_quantile_approx",
    oracle=_weighted_quantile_approx_oracle(),
)
def group_weighted_quantile_approx_q(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Volume-weighted p50/p90/p99 prices from a ≤ 512-row-per-group
    WEIGHTED histogram sketch — the 100 TB companion to the exact
    ``group_weighted_quantile``: micro-unit weight sums per equi-width
    cell build in one map-side-combined pass (no within-group sort),
    merge cell-wise like CMS, and the cumulative-weight walk
    interpolates the crossing cell with error ≤ one cell width
    (≈ 215 here; pinned vs the exact op in tests/test_weighted.py).
    The DuckDB oracle replays bin assignment, quantization, walk, and
    interpolation from the same expressions
    (``operators/weighted.py:group_weighted_quantile_approx``)."""
    li = _li(spark, sf_dir)
    return wt.group_weighted_quantile_approx(
        li, "l_returnflag", "l_extendedprice", "l_quantity", _WQA_QS,
        **_WQA_ARGS)


# discount is an 11-point 0.00–0.10 lattice, tax a 9-point 0.00–0.08
# lattice: one cell per lattice point, so the sketch is ≤ 99 cells per
# supplier and the center substitution is (up to IEEE cell-edge
# rounding, identical in both engines) an affine relabeling
_WCA_ARGS = dict(lox=0.0, hix=0.11, binsx=11,
                 loy=0.0, hiy=0.09, binsy=9)


def _weighted_corr_approx_oracle() -> str:
    inner = wt.sql_group_weighted_corr_approx(
        "lineitem", "l_suppkey", "l_discount", "l_tax",
        "l_extendedprice", **_WCA_ARGS)
    # + 0.0 flushes IEEE negative zero (the exact gate's rule)
    return (f"SELECT grp AS l_suppkey, ROUND(wcorr, 6) + 0.0 AS wcorr, "
            f"ROUND(wcov, 6) + 0.0 AS wcov FROM ({inner})")


@register("group_weighted_corr_approx",
          oracle=_weighted_corr_approx_oracle())
def group_weighted_corr_approx_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Revenue-weighted corr/cov of (discount, tax) per supplier from
    the 2-D WEIGHTED histogram sketch — the mergeable tier the
    quantile family got in r11, extended to the bivariate op (r11
    VERDICT next-#3): ≤ 99 cells per supplier built in ONE
    map-side-combined pass, folded cell-wise without rescans
    (``corr_weighted_incremental_merge`` proves merge ≡ rescan on
    real data); six exact BIGINT cell-moment sums finish through the
    same affine/corr IEEE tree the DuckDB oracle replays. Error is
    grid-bounded; on this lattice fixture each distinct (discount,
    tax) pair owns its own cell, so the estimate tracks the exact
    ``group_weighted_corr`` gate (equality pinned in
    tests/test_weighted.py on an integer lattice)
    (``operators/weighted.py:group_weighted_corr_approx``)."""
    li = _li(spark, sf_dir)
    out = wt.group_weighted_corr_approx(
        li, "l_suppkey", "l_discount", "l_tax", "l_extendedprice",
        **_WCA_ARGS)
    return out.select(
        "l_suppkey",
        (F.round("wcorr", 6) + F.lit(0.0)).alias("wcorr"),
        (F.round("wcov", 6) + F.lit(0.0)).alias("wcov"))


_GAS_BOUNDS_ORACLE = """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS nd_ok, TRUE AS p50_ok, TRUE AS p95_ok
    FROM lineitem WHERE l_returnflag IS NOT NULL
    GROUP BY l_returnflag
    """


@register("group_approx_stats", oracle=_GAS_BOUNDS_ORACLE)
def group_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORACLED contract for the approx-stats family (r11 VERDICT
    next-#6: this name — the one the driver samples — now carries the
    checkable bounds report, so no CORRECTNESS row ever reads
    ``err: no_oracle``; the engine-specific raw sketch values live in
    ``group_approx_stats_raw``, rows-only by design):
    ``group_approx_bounds_report`` computes approx AND exact in one
    plan and emits only exact counts plus per-group booleans asserting
    the sketches' published error bounds (4σ HLL envelope, rank-error
    window for the percentile sketch). The oracle replays the exact
    counts and pins the booleans TRUE — both sketches are
    deterministic functions of the data, so the verdict is stable,
    and a bound violation flips the value hash."""
    li = _li(spark, sf_dir)
    return ga.group_approx_bounds_report(
        li, "l_returnflag", "l_partkey", "l_extendedprice",
        rsd=0.05, accuracy=100, qs=(0.5, 0.95))


# The pre-r12 name of the bounds report stays DECLARED (same fn, same
# oracle): a declared query name must never disappear round-over-round,
# and the alias costs nothing — both names replay the identical plan.
register("group_approx_stats_bounds",
         oracle=_GAS_BOUNDS_ORACLE)(group_approx_stats)


# --------------------------------------------------------- first/last/nth


@register(
    "group_first_last",
    oracle=f"""
    WITH e AS (SELECT event_type, event_id, {_EV_V} AS v FROM events)
    SELECT event_type,
           MIN_BY(v, event_id) FILTER (WHERE v IS NOT NULL) AS first_v,
           MAX_BY(v, event_id) FILTER (WHERE v IS NOT NULL) AS last_v
    FROM e GROUP BY event_type
    """,
)
def group_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_first / group_last, non-null by explicit order
    (`groupby.rs:1662-1917`)."""
    ev = _ev(spark, sf_dir)
    firsts = ga.group_first(ev, "event_type", ["v"], "event_id") \
        .withColumnRenamed("v", "first_v")
    lasts = ga.group_last(ev, "event_type", ["v"], "event_id") \
        .withColumnRenamed("v", "last_v")
    return firsts.join(lasts, "event_type")


@register(
    "group_nth",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, {_EV_V} AS v FROM events
    ), nn AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
      FROM e WHERE v IS NOT NULL
    )
    SELECT k.event_type, p.v AS nth_v
    FROM (SELECT DISTINCT event_type FROM e) k
    LEFT JOIN (SELECT event_type, v FROM nn WHERE rn = 3) p USING (event_type)
    """,
)
def group_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_nth rank=3, 1-based over non-null values
    (`groupby.rs:1876-1878`)."""
    ev = _ev(spark, sf_dir)
    out = ga.group_nth(ev, "event_type", "v", "event_id", rank=3)
    return out.withColumnRenamed("v", "nth_v")


# ---------------------------------------------------- idxmax/idxmin/mode


@register(
    "group_idx_mode",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice ASC, o_orderkey) AS rmin
      FROM orders
    ), prio AS (
      SELECT o_custkey, o_orderpriority, COUNT(*) AS n FROM orders
      GROUP BY o_custkey, o_orderpriority
    ), pmode AS (
      SELECT o_custkey, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY n DESC, o_orderpriority) AS r
      FROM prio
    )
    SELECT mx.o_custkey,
           mx.o_orderkey AS price_idxmax,
           mn.o_orderkey AS price_idxmin,
           pm.o_orderpriority AS prio_mode
    FROM (SELECT o_custkey, o_orderkey FROM ranked WHERE rmax = 1) mx
    JOIN (SELECT o_custkey, o_orderkey FROM ranked WHERE rmin = 1) mn
      USING (o_custkey)
    JOIN (SELECT o_custkey, o_orderpriority FROM pmode WHERE r = 1) pm
      USING (o_custkey)
    """,
)
def group_idx_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas idxmax/idxmin (first-occurrence tie-break) and a
    deterministic mode (count desc, value asc) — all single-aggregate
    compositions, no window over the full table."""
    tune(spark)
    od = load_table(spark, sf_dir, "orders")
    mx = ga.group_idxmax(od, "o_custkey", "o_totalprice", "o_orderkey") \
        .withColumnRenamed("o_totalprice_idx", "price_idxmax")
    mn = ga.group_idxmin(od, "o_custkey", "o_totalprice", "o_orderkey") \
        .withColumnRenamed("o_totalprice_idx", "price_idxmin")
    md = ga.group_mode(od, "o_custkey", "o_orderpriority") \
        .withColumnRenamed("o_orderpriority_mode", "prio_mode")
    return mx.join(mn, "o_custkey").join(md, "o_custkey")


# ------------------------------------------------- PyObject (string) path


@register(
    "group_first_last_string",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS et
      FROM events
    )
    SELECT user_id,
           MIN_BY(et, event_id) FILTER (WHERE et IS NOT NULL) AS first_type,
           MAX_BY(et, event_id) FILTER (WHERE et IS NOT NULL) AS last_type,
           COUNT(DISTINCT et) AS n_types
    FROM e GROUP BY user_id
    """,
)
def group_first_last_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PyObject kernels (`group_last_pyobject` /
    `group_nth_pyobject`, `groupby.rs:1746-2007`) exist because Rust
    can't monomorphize over Python objects; Spark strings are native
    columnar — same operators, no special path."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "et", F.when(F.col("event_id") % 11 == 0, F.lit(None))
        .otherwise(F.col("event_type"))
    )
    firsts = ga.group_first(ev, "user_id", ["et"], "event_id") \
        .withColumnRenamed("et", "first_type")
    lasts = ga.group_last(ev, "user_id", ["et"], "event_id") \
        .withColumnRenamed("et", "last_type")
    nuniq = ga.group_nunique(ev, "user_id", ["et"]) \
        .withColumnRenamed("et", "n_types")
    return firsts.join(lasts, "user_id").join(nuniq, "user_id")


# ------------------------------------------------------------------ ohlc


@register(
    "group_ohlc",
    oracle=f"""
    WITH e AS (SELECT event_type, event_id, {_EV_V} AS v FROM events)
    SELECT event_type,
           MIN_BY(v, event_id) FILTER (WHERE v IS NOT NULL) AS open,
           MAX(v) AS high, MIN(v) AS low,
           MAX_BY(v, event_id) FILTER (WHERE v IS NOT NULL) AS close
    FROM e GROUP BY event_type
    """,
)
def group_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_ohlc *intended* semantics (`groupby.rs:1405-1530`; the
    reference kernel is buggy, SURVEY §2.4 #2)."""
    ev = _ev(spark, sf_dir)
    return ga.group_ohlc(ev, "event_type", "v", "event_id")


# --------------------------------------------------------------- any / all


@register(
    "group_any_all",
    oracle="""
    SELECT l_orderkey,
           BOOL_OR(l_quantity > 45) AS any_high_qty,
           BOOL_AND(l_discount > 0) AS all_discounted
    FROM lineitem GROUP BY l_orderkey
    """,
)
def group_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_any_all skipna=True (`groupby.rs:698-784`)."""
    li = _li(spark, sf_dir).select(
        "l_orderkey",
        (F.col("l_quantity") > 45).alias("any_high_qty"),
        (F.col("l_discount") > 0).alias("all_discounted"),
    )
    return ga.group_any_all(li, "l_orderkey", ["any_high_qty"], val_test="any") \
        .join(ga.group_any_all(li, "l_orderkey", ["all_discounted"], val_test="all"),
              "l_orderkey")


@register(
    "group_any_all_kleene",
    oracle="""
    WITH b AS (
      SELECT l_orderkey,
             CASE WHEN l_linenumber = 2 THEN NULL ELSE l_quantity > 45 END AS flag
      FROM lineitem
    )
    SELECT l_orderkey,
           CASE WHEN BOOL_OR(flag) THEN TRUE
                WHEN COUNT(CASE WHEN flag IS NULL THEN 1 END) > 0 THEN NULL
                ELSE FALSE END AS any_flag,
           CASE WHEN NOT BOOL_AND(flag) THEN FALSE
                WHEN COUNT(CASE WHEN flag IS NULL THEN 1 END) > 0 THEN NULL
                ELSE TRUE END AS all_flag
    FROM b GROUP BY l_orderkey
    """,
)
def group_any_all_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_any_all skipna=False — Kleene three-valued logic
    (`groupby.rs:737-754`; -1 'unknown' ⇔ NULL)."""
    li = _li(spark, sf_dir).select(
        "l_orderkey",
        F.when(F.col("l_linenumber") == 2, F.lit(None))
        .otherwise(F.col("l_quantity") > 45)
        .alias("flag"),
    )
    anys = ga.group_any_all(li, "l_orderkey", ["flag"], val_test="any",
                            skipna=False).withColumnRenamed("flag", "any_flag")
    alls = ga.group_any_all(li, "l_orderkey", ["flag"], val_test="all",
                            skipna=False).withColumnRenamed("flag", "all_flag")
    return anys.join(alls, "l_orderkey")


# -------------------------------------------------------------------- pivot


@register(
    "group_pivot",
    oracle=f"""
    SELECT l_linestatus,
           {dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE NULL END")} AS qty_A,
           {dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE NULL END")} AS qty_N,
           {dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE NULL END")} AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def group_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``pivot_table(index, columns, values, aggfunc='sum')`` as
    ``groupBy().pivot(col, values)``. The pivot values are supplied
    explicitly — Spark otherwise runs an extra distinct job to discover
    them, a full scan you never want at 100 TB; with the list given the
    pivot compiles to conditional aggregation in one pass (exactly the
    oracle's CASE form)."""
    li = _li(spark, sf_dir)
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(_exact(F.col("l_quantity")))
        .withColumnRenamed("A", "qty_A")
        .withColumnRenamed("N", "qty_N")
        .withColumnRenamed("R", "qty_R")
    )


# ------------------------------------------------------------- value_counts


@register(
    "group_value_counts",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER (
             PARTITION BY user_id) AS DOUBLE), 6) AS share
    FROM events GROUP BY user_id, event_type
    """,
)
def group_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby.value_counts(normalize=True)``: per-group value
    frequencies plus each value's share of its group. The share reuses
    the groupBy shuffle (window over the same partitioning — no second
    exchange)."""
    tune(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "share",
            F.round(F.col("n").cast("double")
                    / F.sum("n").over(w).cast("double"), 6),
        )
    )


# ---------------------------------------------------------------- cut/qcut


@register(
    "group_cut_qcut",
    oracle="""
    WITH b AS (
      SELECT event_id, value,
             CAST(FLOOR(value / 25.0) AS BIGINT) AS cut_bin,
             NTILE(4) OVER (ORDER BY value, event_id) AS qcut_bin
      FROM events
    )
    SELECT cut_bin, qcut_bin, COUNT(*) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM b GROUP BY cut_bin, qcut_bin
    """,
)
def group_cut_qcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``cut`` (fixed-width bins — pure arithmetic, no data pass
    to find edges) and ``qcut`` (equal-frequency bins via ntile; the
    deterministic (value, id) sort makes tie assignment reproducible),
    then a profile of each bin. ntile needs a global sort — at 100 TB
    prefer approx percentile edges + the cut path; this exact form is
    for the pandas-parity surface."""
    tune(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy(F.col("value"), F.col("event_id"))
    b = ev.select(
        "event_id", "value",
        F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("cut_bin"),
        F.ntile(4).over(w).alias("qcut_bin"),
    )
    return b.groupBy("cut_bin", "qcut_bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# ---------------------------------------------------------------- corr/cov


@register(
    "group_corr_cov",
    oracle="""
    WITH f AS (
      SELECT l_suppkey,
             CAST(FLOOR(l_quantity * 1000) AS HUGEINT) AS fx,
             CAST(FLOOR(l_extendedprice * 1000) AS HUGEINT) AS fy
      FROM lineitem
    ), s AS (
      SELECT l_suppkey, COUNT(*) AS n,
             SUM(fx) AS sx, SUM(fy) AS sy, SUM(fx * fy) AS sxy,
             SUM(fx * fx) AS sxx, SUM(fy * fy) AS syy
      FROM f GROUP BY l_suppkey
    )
    SELECT l_suppkey,
           ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
               / SQRT(CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS corr,
           ROUND(CASE WHEN n >= 2 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) / 1e6 END, 6) AS cov
    FROM s
    """,
)
def group_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson corr + sample cov of (quantity, price) via
    exact fixed-point power sums — one aggregation pass, deterministic
    across engines (decimal vs HUGEINT integer arithmetic; the float
    division at the end starts from identical integers)."""
    li = _li(spark, sf_dir)
    out = ga.group_corr_cov(li, "l_suppkey", "l_quantity", "l_extendedprice")
    return out.select(
        "l_suppkey",
        F.round("corr", 6).alias("corr"),
        F.round("cov", 6).alias("cov"),
    )


@register(
    "group_melt",
    oracle=f"""
    WITH m AS (
      SELECT 'l_quantity' AS variable, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT variable, COUNT(value) AS n,
           {dsum('value')} AS sum_value
    FROM m GROUP BY variable
    """,
)
def group_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt (wide → long, Spark native unpivot/Expand — no shuffle, no
    UDF) then aggregate per variable; the long form is what plotting /
    normalization pipelines consume. Fixed-point sums keep the compare
    exact."""
    from pandas_rust_algos_spark.operators.pivot import melt

    li = _li(spark, sf_dir)
    long = melt(li, ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_discount", "l_tax"])
    return long.groupBy("variable").agg(
        F.count("value").alias("n"),
        (F.sum(F.floor(F.col("value") * F.lit(1e6)).cast("long"))
         .cast("double") / F.lit(1e6)).alias("sum_value"),
    )


def _desc_pick(q: str) -> str:
    """Oracle fragments for one linear-interpolated quartile at q."""
    t = f"CAST({q} AS DOUBLE) * (n - 1)"
    tag = q.replace("0.", "")
    return f"""
         MAX(CASE WHEN rn = CAST(FLOOR({t}) AS BIGINT) THEN v END) AS lo{tag},
         MAX(CASE WHEN rn = CAST(CEIL({t}) AS BIGINT) THEN v END) AS hi{tag},
         MAX(CASE WHEN rn = CAST(FLOOR({t}) AS BIGINT)
                  THEN {t} - FLOOR({t}) END) AS f{tag}"""


@register(
    "group_describe",
    oracle=f"""
    WITH nn AS (
      SELECT l_returnflag AS k, l_extendedprice AS v,
             CAST(FLOOR(l_extendedprice * 1e3) AS HUGEINT) AS fx,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), a AS (
      SELECT k, COUNT(*) AS cnt, SUM(fx) AS sx, SUM(fx * fx) AS sxx,
             MIN(v) AS vmin, MAX(v) AS vmax,
             {_desc_pick('0.25')},
             {_desc_pick('0.5')},
             {_desc_pick('0.75')}
      FROM nn GROUP BY k
    )
    SELECT k AS l_returnflag, cnt AS count,
           CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE) / 1e3 AS mean,
           CASE WHEN cnt >= 2 THEN
             SQRT(GREATEST(CAST(cnt * sxx - sx * sx AS DOUBLE),
                           CAST(0 AS DOUBLE))
                  / CAST(cnt * (cnt - 1) AS DOUBLE)) / 1e3 END AS std,
           vmin AS min,
           ROUND(lo25 + f25 * (hi25 - lo25), 6) AS q25,
           ROUND(lo5 + f5 * (hi5 - lo5), 6) AS q50,
           ROUND(lo75 + f75 * (hi75 - lo75), 6) AS q75,
           vmax AS max
    FROM a
    """,
)
def group_describe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas describe(): count/mean/std/min/quartiles/max in ONE
    shuffle — the quantile rank-window's hash partitioning is reused by
    the aggregation (no second Exchange); mean/std from exact decimal
    power sums (deterministic vs the oracle's HUGEINT arithmetic)."""
    li = _li(spark, sf_dir)
    out = ga.group_describe(li, "l_returnflag", "l_extendedprice")
    return out.select(
        "l_returnflag", "count", "mean", "std", "min",
        F.round("q25", 6).alias("q25"),
        F.round("q50", 6).alias("q50"),
        F.round("q75", 6).alias("q75"),
        "max",
    )


@register(
    "group_histogram",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             LEAST(CAST(FLOOR((l_quantity - CAST(1 AS DOUBLE)) * 10
                        / CAST(50 AS DOUBLE)) AS BIGINT),
                   CAST(9 AS BIGINT)) AS bucket
      FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 51
    )
    SELECT l_returnflag, bucket, COUNT(*) AS n,
           CAST(1 AS DOUBLE) + bucket * CAST(5 AS DOUBLE) AS bin_lo
    FROM b GROUP BY l_returnflag, bucket
    """,
)
def group_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of quantity per return flag: bucketing is a
    projection + one map-side-combined count — the profiling shape that
    needs no per-group sort at any scale. Integer-valued quantities make
    every bin edge exact in both engines."""
    li = _li(spark, sf_dir)
    return ga.group_histogram(li, "l_returnflag", "l_quantity",
                              lo=1, hi=51, nbins=10)


def _wins_bound_sql(q: float, tag: str) -> str:
    t = f"CAST({q} AS DOUBLE) * (n - 1)"
    return f"""
    MAX(CASE WHEN rn = CAST(FLOOR({t}) AS BIGINT) THEN v END)
      OVER (PARTITION BY k) AS {tag}_vlo,
    MAX(CASE WHEN rn = CAST(CEIL({t}) AS BIGINT) THEN v END)
      OVER (PARTITION BY k) AS {tag}_vhi,
    MAX(CASE WHEN rn = CAST(FLOOR({t}) AS BIGINT)
        THEN {t} - FLOOR({t}) END)
      OVER (PARTITION BY k) AS {tag}_frac"""


@register(
    "group_winsorize",
    oracle=f"""
    WITH nn AS (
      SELECT l_returnflag AS k, l_orderkey, l_linenumber,
             l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice NULLS LAST) - 1 AS rn,
             COUNT(l_extendedprice) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), b AS (
      SELECT k, l_orderkey, l_linenumber, v,
             {_wins_bound_sql(0.05, 'lo')},
             {_wins_bound_sql(0.95, 'hi')}
      FROM nn
    )
    SELECT k AS l_returnflag, l_orderkey, l_linenumber,
           v AS l_extendedprice,
           ROUND(CASE WHEN v IS NOT NULL THEN
             LEAST(GREATEST(v, lo_vlo + lo_frac * (lo_vhi - lo_vlo)),
                   hi_vlo + hi_frac * (hi_vhi - hi_vlo)) END, 6) AS wins
    FROM b
    """,
)
def group_winsorize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at [p05, p95] — the rank-window quantile
    bounds and the clip share ONE group-keyed shuffle (no agg+join
    back), every row kept; the oracle rebuilds the same interpolated
    bounds from window order statistics."""
    from pandas_rust_algos_spark.operators.grouped_transform import (
        group_winsorize,
    )

    li = _li(spark, sf_dir)
    out = group_winsorize(
        li, "l_returnflag", "l_extendedprice", lower=0.05, upper=0.95,
        out_col="wins",
    )
    return out.select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice",
        F.round("wins", 6).alias("wins"),
    )


@register(
    "group_robust_zscore",
    oracle="""
    WITH nn AS (
      SELECT l_returnflag AS k, l_extendedprice AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), med AS (
      SELECT k, ROUND(MEDIAN(v), 6) AS med FROM nn GROUP BY 1
    ), mad AS (
      SELECT nn.k, ROUND(MEDIAN(ABS(v - med)), 6) AS mad
      FROM nn JOIN med USING (k) GROUP BY 1
    )
    SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber,
           l.l_extendedprice,
           CASE WHEN l.l_extendedprice IS NOT NULL AND mad > 0
                THEN ROUND((l.l_extendedprice - med)
                           / (CAST(1.4826 AS DOUBLE) * mad), 6) END AS rz
    FROM lineitem l
    LEFT JOIN med ON l.l_returnflag = med.k
    LEFT JOIN mad ON l.l_returnflag = mad.k
    """,
)
def group_robust_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) per-group standardization — the
    outlier-resistant twin of ``group_zscore`` (breakdown point 50%
    vs 0%). Both medians run on a narrow (keys, value) projection and
    broadcast back; full rows never shuffle
    (``grouped_transform.group_robust_zscore``)."""
    from pandas_rust_algos_spark.operators.grouped_transform import (
        group_robust_zscore,
    )

    li = _li(spark, sf_dir)
    out = group_robust_zscore(
        li, "l_returnflag", "l_extendedprice", out_col="rz")
    return out.select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice",
        "rz",
    )
