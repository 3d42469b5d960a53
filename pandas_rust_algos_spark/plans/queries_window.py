"""Gate queries for the grouped transform/indexer operators (SURVEY
§2.1 rows 17-23) and take/gather (rows 1-3), each with DuckDB oracle
SQL producing per-row results.

Ordering: the reference kernels walk rows in array order; here order is
the explicit unique key (l_orderkey, l_linenumber) / event_id. All
transforms over the same (partition, order) share one Sort+Exchange.

Determinism: running double sums would associate differently in DuckDB
(segment trees) vs Spark (running frame), so cumsum runs on fixed-point
micro-unit longs in both engines (registry rule 1); cumprod rounds
(rule 4); everything else (lag/lead, min/max, fill, rank picks) is
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import grouped_transform as gt
from pandas_rust_algos_spark.operators import take as tk
from pandas_rust_algos_spark.plans.registry import register
from pandas_rust_algos_spark.session import tune
from pandas_rust_algos_spark.sources import load_table

# (l_orderkey, l_linenumber) is NOT unique in the fixtures, so the
# window order extends to the value columns: rows tied on the full
# ordering tuple are output-indistinguishable, making every windowed
# result a deterministic row set even under engine-specific tie order.
_ORDER = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
_ROWKEY = "l_orderkey, l_linenumber"
_W = ("PARTITION BY l_suppkey "
      "ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice "
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "lineitem")


def _ev_nullable(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("value")).alias("v"),
    )


_EV_NULLABLE = ("SELECT user_id, event_id, "
                "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v "
                "FROM events")


# ------------------------------------------------------------------- cumsum


@register(
    "group_cumsum",
    oracle=f"""
    SELECT {_ROWKEY},
           CAST(SUM(CAST(FLOOR(l_quantity * 1e6) AS BIGINT)) OVER ({_W})
                AS DOUBLE) / 1e6 AS qty_cumsum
    FROM lineitem
    """,
)
def group_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_cumsum (`groupby.rs:424-536`) — running frame window."""
    li = _li(spark, sf_dir).withColumn(
        "qty_fx", F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    )
    out = gt.group_cumsum(li, "l_suppkey", _ORDER, ["qty_fx"])
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.col("qty_fx_cumsum").cast("double") / F.lit(1e6)).alias("qty_cumsum"),
    )


@register(
    "group_cumsum_skipna",
    oracle=f"""
    WITH b AS (
      SELECT l_suppkey, {_ROWKEY}, l_quantity, l_extendedprice,
             CASE WHEN l_linenumber = 2 THEN NULL
                  ELSE CAST(FLOOR(l_quantity * 1e6) AS BIGINT) END AS v
      FROM lineitem
    )
    SELECT {_ROWKEY},
           CASE WHEN v IS NULL THEN NULL
                ELSE CAST(SUM(v) OVER ({_W}) AS DOUBLE) / 1e6 END
             AS cumsum_skipna,
           CASE WHEN MAX(CASE WHEN v IS NULL THEN 1 ELSE 0 END) OVER ({_W}) = 1
                THEN NULL
                ELSE CAST(SUM(v) OVER ({_W}) AS DOUBLE) / 1e6 END
             AS cumsum_poison
    FROM b
    """,
)
def group_cumsum_skipna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NA rules of the cumulatives: NA row → NA out; skipna=False
    poisons the rest of the group (`groupby.rs:505-519`)."""
    li = _li(spark, sf_dir).withColumn(
        "v",
        F.when(F.col("l_linenumber") == 2, F.lit(None))
        .otherwise(F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")),
    )
    out = gt.group_cumsum(li, "l_suppkey", _ORDER, ["v"], skipna=True,
                          out_suffix="_sk")
    out = gt.group_cumsum(out, "l_suppkey", _ORDER, ["v"], skipna=False,
                          out_suffix="_po")
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.col("v_sk").cast("double") / F.lit(1e6)).alias("cumsum_skipna"),
        (F.col("v_po").cast("double") / F.lit(1e6)).alias("cumsum_poison"),
    )


# ------------------------------------------------------------ cummin/cummax


@register(
    "group_cummin_cummax",
    oracle=f"""
    SELECT {_ROWKEY},
           MIN(l_extendedprice) OVER ({_W}) AS price_cummin,
           MAX(l_extendedprice) OVER ({_W}) AS price_cummax
    FROM lineitem
    """,
)
def group_cummin_cummax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_cummin / group_cummax intended semantics
    (`groupby.rs:2185-2293`; dispatch bug §2.4 #1 not reproduced)."""
    li = _li(spark, sf_dir)
    out = gt.group_cummin(li, "l_suppkey", _ORDER, ["l_extendedprice"],
                          out_suffix="_cmn")
    out = gt.group_cummax(out, "l_suppkey", _ORDER, ["l_extendedprice"],
                          out_suffix="_cmx")
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice_cmn").alias("price_cummin"),
        F.col("l_extendedprice_cmx").alias("price_cummax"),
    )


# ------------------------------------------------------------------ cumprod


@register(
    "group_cumprod",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(PRODUCT(1 + l_discount) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_discount
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS disc_cumprod
    FROM lineitem
    """,
)
def group_cumprod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_cumprod (`groupby.rs:211-300`) — sign/zero-aware
    exp(Σlog|x|) composition, JVM-side; rounded (rule 4)."""
    li = _li(spark, sf_dir).withColumn("disc1", 1 + F.col("l_discount"))
    out = gt.group_cumprod(li, "l_orderkey", ["l_linenumber", "l_discount"], ["disc1"])
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("disc1_cumprod", 6).alias("disc_cumprod"),
    )


# ------------------------------------------------------------------- shift


@register(
    "group_shift",
    oracle=f"""
    SELECT {_ROWKEY},
           LAG(l_quantity, 2) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
              l_quantity, l_extendedprice) AS qty_lag2,
           LEAD(l_quantity, 1) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
              l_quantity, l_extendedprice) AS qty_lead1
    FROM lineitem
    """,
)
def group_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_shift_indexer ±periods (`groupby.rs:538-595`); NULL where
    the reference emits -1, incl. groups shorter than |periods|."""
    li = _li(spark, sf_dir)
    out = gt.group_shift(li, "l_suppkey", _ORDER, ["l_quantity"], periods=2,
                         out_suffix="_lag2")
    out = gt.group_shift(out, "l_suppkey", _ORDER, ["l_quantity"], periods=-1,
                         out_suffix="_lead1")
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity_lag2").alias("qty_lag2"),
        F.col("l_quantity_lead1").alias("qty_lead1"),
    )


# ------------------------------------------------------------- ffill/bfill


@register(
    "group_fillna",
    oracle=f"""
    WITH e AS ({_EV_NULLABLE}),
    r AS (
      SELECT user_id, event_id, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rnd
      FROM e
    )
    SELECT event_id,
           COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER wf) AS v_ffill,
           COALESCE(v, LAST_VALUE(v IGNORE NULLS) OVER wb) AS v_bfill,
           CASE WHEN v IS NOT NULL THEN v
                WHEN rn - MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER wf <= 2
                THEN LAST_VALUE(v IGNORE NULLS) OVER wf
           END AS v_ffill_limit2
    FROM r
    WINDOW
      wf AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wb AS (PARTITION BY user_id ORDER BY event_id DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def group_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_fillna_indexer (`groupby.rs:621-669`): ffill, bfill
    (reversed-order same algorithm, `606-608`), and limit= max
    consecutive fills (`645-650`)."""
    ev = _ev_nullable(spark, sf_dir)
    out = gt.group_fillna(ev, "user_id", ["event_id"], ["v"],
                          direction="ffill", out_suffix="_ff")
    out = gt.group_fillna(out, "user_id", ["event_id"], ["v"],
                          direction="bfill", out_suffix="_bf")
    out = gt.group_fillna(out, "user_id", ["event_id"], ["v"],
                          direction="ffill", limit=2, out_suffix="_ffl")
    return out.select(
        "event_id",
        F.col("v_ff").alias("v_ffill"),
        F.col("v_bf").alias("v_bfill"),
        F.col("v_ffl").alias("v_ffill_limit2"),
    )


# -------------------------------------------------------------------- rank


@register(
    "group_rank",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             RANK() OVER w AS rmin,
             DENSE_RANK() OVER w AS rdense,
             ROW_NUMBER() OVER w AS rfirst,
             COUNT(*) OVER (PARTITION BY o_orderpriority, o_totalprice) AS ties,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    )
    SELECT o_orderkey,
           CAST(rmin AS DOUBLE) + (ties - 1) / 2.0 AS rank_avg,
           CAST(rmin AS DOUBLE) AS rank_min,
           CAST(rdense AS DOUBLE) AS rank_dense,
           (CAST(rmin AS DOUBLE) + (ties - 1) / 2.0) / n AS rank_pct
    FROM r
    """,
)
def group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_rank — declared-but-stubbed in the reference
    (`lib.rs:1259-1274`); implements the declared pandas surface:
    ties average/min/dense (+first), pct."""
    tune(spark)
    od = load_table(spark, sf_dir, "orders")
    out = gt.group_rank(od, "o_orderpriority", "o_totalprice",
                        method="average", out_col="rank_avg")
    out = gt.group_rank(out, "o_orderpriority", "o_totalprice",
                        method="min", out_col="rank_min")
    out = gt.group_rank(out, "o_orderpriority", "o_totalprice",
                        method="dense", out_col="rank_dense")
    out = gt.group_rank(out, "o_orderpriority", "o_totalprice",
                        method="average", pct=True, out_col="rank_pct")
    return out.select("o_orderkey", "rank_avg", "rank_min", "rank_dense",
                      "rank_pct")


# --------------------------------------------------------- diff/pct_change


@register(
    "group_diff_pct",
    oracle=f"""
    SELECT {_ROWKEY},
           l_quantity - LAG(l_quantity, 1) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
              l_quantity, l_extendedprice) AS qty_diff,
           CASE WHEN LAG(l_quantity, 1) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
              l_quantity, l_extendedprice) <> 0
             THEN l_quantity / LAG(l_quantity, 1) OVER
               (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
                l_quantity, l_extendedprice) - 1 END AS qty_pct
    FROM lineitem
    """,
)
def group_diff_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas diff / pct_change as lag compositions over the shared
    window (division is a scalar double op — deterministic
    cross-engine)."""
    li = _li(spark, sf_dir)
    out = gt.group_diff(li, "l_suppkey", _ORDER, ["l_quantity"])
    out = gt.group_pct_change(out, "l_suppkey", _ORDER, ["l_quantity"])
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity_diff").alias("qty_diff"),
        F.col("l_quantity_pct").alias("qty_pct"),
    )


# ---------------------------------------------------------------- cumcount


@register(
    "group_cumcount",
    oracle=f"""
    SELECT {_ROWKEY},
           COUNT(*) OVER ({_W}) - 1 AS cumcount
    FROM lineitem
    """,
)
def group_cumcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0-based within-group running position (pandas cumcount)."""
    li = _li(spark, sf_dir)
    out = gt.group_cumcount(li, "l_suppkey", _ORDER)
    return out.select("l_orderkey", "l_linenumber", "cumcount")


# ---------------------------------------------------------------- rolling


@register(
    "rolling_stats",
    oracle=f"""
    WITH b AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             CAST(FLOOR(l_quantity * 1e6) AS BIGINT) AS qfx
      FROM lineitem
    )
    SELECT {_ROWKEY},
           CASE WHEN COUNT(qfx) OVER w3 >= 3 THEN
             CAST(SUM(qfx) OVER w3 AS DOUBLE) / 1e6 / COUNT(qfx) OVER w3
           END AS qty_roll_mean,
           CASE WHEN COUNT(qfx) OVER w3 >= 3 THEN MAX(l_quantity) OVER w3
           END AS qty_roll_max
    FROM b
    WINDOW w3 AS (PARTITION BY l_suppkey
                  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas rolling(3) mean/max with min_periods — trailing row
    frames; the fixed-point mean keeps the oracle compare exact."""
    li = _li(spark, sf_dir).withColumn(
        "qfx", F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    )
    out = gt.rolling_agg(li, "l_suppkey", _ORDER, ["qfx"],
                         window=3, aggs=("sum", "count"), min_periods=3)
    out = gt.rolling_agg(out, "l_suppkey", _ORDER, ["l_quantity"],
                         window=3, aggs=("max",), min_periods=3)
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.col("qfx_roll_sum").cast("double") / F.lit(1e6)
         / F.col("qfx_roll_count")).alias("qty_roll_mean"),
        F.col("l_quantity_roll_max").alias("qty_roll_max"),
    )


@register(
    "group_expanding",
    oracle=f"""
    WITH b AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             CAST(FLOOR(l_quantity * 1e6) AS BIGINT) AS qfx
      FROM lineitem
    )
    SELECT {_ROWKEY},
           CASE WHEN COUNT(qfx) OVER w >= 2 THEN
             CAST(SUM(qfx) OVER w AS DOUBLE) / 1e6 / COUNT(qfx) OVER w
           END AS qty_exp_mean,
           CASE WHEN COUNT(qfx) OVER w >= 2 THEN MAX(l_quantity) OVER w
           END AS qty_exp_max
    FROM b
    WINDOW w AS ({_W})
    """,
)
def group_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``expanding(min_periods=2)`` mean/max — start-of-group →
    current-row frames; fixed-point mean keeps the compare exact."""
    li = _li(spark, sf_dir).withColumn(
        "qfx", F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    )
    out = gt.expanding_agg(li, "l_suppkey", _ORDER, ["qfx"],
                           aggs=("sum", "count"), min_periods=2)
    out = gt.expanding_agg(out, "l_suppkey", _ORDER, ["l_quantity"],
                           aggs=("max",), min_periods=2)
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.col("qfx_exp_sum").cast("double") / F.lit(1e6)
         / F.col("qfx_exp_count")).alias("qty_exp_mean"),
        F.col("l_quantity_exp_max").alias("qty_exp_max"),
    )


@register(
    "rolling_time_1h",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS vfx
      FROM events
    )
    SELECT user_id, event_id,
           COUNT(vfx) OVER w AS n_1h,
           CAST(SUM(vfx) OVER w AS DOUBLE) / 1e6 AS sum_1h
    FROM b
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def rolling_time_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based trailing window: per-user count and exact fixed-point
    sum of the last hour's events at every event — RANGE frame over
    epoch-microseconds, so rows tied on ts are peers and the row set is
    deterministic without any tiebreak (see ``rolling_time_agg``).
    closed='both' here to mirror the oracle's bare SQL RANGE frame;
    the pandas-default closed='right' variant is gated separately by
    ``rolling_time_1h_closed_right``."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("vfx"),
    )
    out = gt.rolling_time_agg(ev, "user_id", "ts", ["vfx"],
                              duration="1 hour", aggs=("count", "sum"),
                              closed="both")
    return out.select(
        "user_id", "event_id",
        F.col("vfx_troll_count").alias("n_1h"),
        (F.col("vfx_troll_sum").cast("double") / F.lit(1e6)).alias("sum_1h"),
    )


@register(
    "rolling_time_1h_closed_right",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS vfx
      FROM events
    )
    SELECT user_id, event_id,
           COUNT(vfx) OVER w AS n_1h,
           CAST(SUM(vfx) OVER w AS DOUBLE) / 1e6 AS sum_1h
    FROM b
    WINDOW w AS (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_time_1h_closed_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-default half-open frame ``(t-1h, t]`` (closed='right'):
    the oracle orders by integer epoch-microseconds with a
    duration−1µs RANGE bound, the exact same frame arithmetic the
    operator uses — a row precisely one hour old is excluded."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("vfx"),
    )
    out = gt.rolling_time_agg(ev, "user_id", "ts", ["vfx"],
                              duration="1 hour", aggs=("count", "sum"))
    return out.select(
        "user_id", "event_id",
        F.col("vfx_troll_count").alias("n_1h"),
        (F.col("vfx_troll_sum").cast("double") / F.lit(1e6)).alias("sum_1h"),
    )


@register(
    "rolling_corr_cov",
    oracle=f"""
    WITH f AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             CAST(FLOOR(l_quantity * 1000) AS HUGEINT) AS fx,
             CAST(FLOOR(l_extendedprice * 1000) AS HUGEINT) AS fy
      FROM lineitem
    ), s AS (
      SELECT l_orderkey, l_linenumber,
             COUNT(*) OVER w4 AS n,
             SUM(fx) OVER w4 AS sx, SUM(fy) OVER w4 AS sy,
             SUM(fx * fy) OVER w4 AS sxy,
             SUM(fx * fx) OVER w4 AS sxx, SUM(fy * fy) OVER w4 AS syy
      FROM f
      WINDOW w4 AS (PARTITION BY l_suppkey
                    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT {_ROWKEY},
           ROUND(CASE WHEN n >= 4 AND n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
               / SQRT(CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS roll_corr,
           ROUND(CASE WHEN n >= 4 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) / 1e6 END, 6) AS roll_cov
    FROM s
    """,
)
def rolling_corr_cov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas rolling(4).corr/cov of (quantity, price) — six window
    power sums over one shared frame (single Sort+Exchange), exact
    fixed-point integers until the final float division (round-6:
    engine rounding inherent in the divisions)."""
    li = _li(spark, sf_dir)
    out = gt.rolling_corr_cov(li, "l_suppkey", _ORDER,
                              "l_quantity", "l_extendedprice", window=4)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("roll_corr", 6).alias("roll_corr"),
        F.round("roll_cov", 6).alias("roll_cov"),
    )


@register(
    "rolling_quantile",
    oracle=f"""
    WITH b AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             CAST(FLOOR(l_quantity * 1e6) AS BIGINT) AS qfx
      FROM lineitem
    ), s AS (
      SELECT l_orderkey, l_linenumber,
             list_sort(list(qfx) OVER w5) AS arr,
             COUNT(qfx) OVER w5 AS n
      FROM b
      WINDOW w5 AS (PARTITION BY l_suppkey
                    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN n >= 3 THEN
             (CAST(arr[CAST(FLOOR((n-1) * 0.5) AS INT) + 1] AS DOUBLE)
              + (CAST(arr[LEAST(CAST(FLOOR((n-1) * 0.5) AS INT) + 2, n)] AS DOUBLE)
                 - CAST(arr[CAST(FLOOR((n-1) * 0.5) AS INT) + 1] AS DOUBLE))
                * ((n-1) * 0.5 - FLOOR((n-1) * 0.5))) / 1e6
           END AS roll_median,
           CASE WHEN n >= 3 THEN
             (CAST(arr[CAST(FLOOR((n-1) * 0.75) AS INT) + 1] AS DOUBLE)
              + (CAST(arr[LEAST(CAST(FLOOR((n-1) * 0.75) AS INT) + 2, n)] AS DOUBLE)
                 - CAST(arr[CAST(FLOOR((n-1) * 0.75) AS INT) + 1] AS DOUBLE))
                * ((n-1) * 0.75 - FLOOR((n-1) * 0.75))) / 1e6
           END AS roll_p75
    FROM s
    """,
)
def rolling_quantile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas rolling(5, min_periods=3).quantile for q=0.5/0.75 —
    sorted bounded frame arrays (O(window) state, never whole-group
    buffering); fixed-point micro-unit inputs make the linear
    interpolation exact in doubles, so the oracle compares unrounded."""
    li = _li(spark, sf_dir).withColumn(
        "qfx", F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    )
    out = gt.rolling_quantile(li, "l_suppkey", _ORDER, "qfx",
                              window=5, q=0.5, min_periods=3,
                              out_col="med_fx")
    out = gt.rolling_quantile(out, "l_suppkey", _ORDER, "qfx",
                              window=5, q=0.75, min_periods=3,
                              out_col="p75_fx")
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.col("med_fx") / F.lit(1e6)).alias("roll_median"),
        (F.col("p75_fx") / F.lit(1e6)).alias("roll_p75"),
    )


# -------------------------------------------------------------------- ewm


@register(
    "group_ewm_mean",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    )
    SELECT a.event_id,
           ROUND(SUM(POW(0.5, a.rn - b.rn) * b.value)
                 / SUM(POW(0.5, a.rn - b.rn)), 6) AS v_ewm
    FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
    GROUP BY a.event_id
    """,
)
def group_ewm_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted mean, α=0.5 (decay powers of 0.5 are
    exact in binary fp, so the O(n²)-per-group SQL oracle agrees to
    round-6 with the bounded-lookback fold)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    out = gt.group_ewm_mean(ev, "user_id", ["event_id"], ["value"], alpha=0.5)
    return out.select("event_id", F.round("value_ewm", 6).alias("v_ewm"))


@register(
    "group_ewm_mean_recursive",
    oracle="""
    WITH r AS (
      SELECT event_id,
             ARRAY_AGG(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 50 PRECEDING AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT event_id,
           LIST_REDUCE(vals, (y, x) -> y * 0.5 + x * 0.5) AS v_ewm_rec
    FROM r
    """,
)
def group_ewm_mean_recursive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ewm adjust=False (the recursive y=(1-α)y+αx form), α=0.5. The
    oracle runs the *same* sequential fold (list_reduce seeds with the
    frame-opening element, exactly like the Spark aggregate) over the
    same 50-row lookback — identical operation order ⇒ bit-identical
    doubles (no rounding: a Σ-of-weighted-terms oracle differs in
    association order, and even ROUND itself tie-breaks differently
    across engines)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    out = gt.group_ewm_mean(ev, "user_id", ["event_id"], ["value"], alpha=0.5,
                            adjust=False)
    return out.select("event_id", F.col("value_ewm").alias("v_ewm_rec"))


@register(
    "group_ewm_mean_noskip",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    )
    SELECT a.event_id,
           ROUND(CASE WHEN a.v IS NULL THEN NULL ELSE
             SUM(POW(0.5, a.rn - b.rn) * b.v)
             / SUM(CASE WHEN b.v IS NOT NULL
                        THEN POW(0.5, a.rn - b.rn) END) END, 6) AS v_ewm_noskip
    FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
    GROUP BY a.event_id, a.v
    """,
)
def group_ewm_mean_noskip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted mean with pandas' default
    ``ignore_na=False``: NULL rows age the decay weights without
    contributing (the O(n²) oracle keys weights to absolute row
    position, not observation count). NULLs injected deterministically
    (event_id % 7)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn(
        "v",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    out = gt.group_ewm_mean(ev, "user_id", ["event_id"], ["v"], alpha=0.5,
                            ignore_na=False)
    return out.select("event_id", F.round("v_ewm", 6).alias("v_ewm_noskip"))


@register(
    "group_ewm_var_std",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ), s AS (
      SELECT a.event_id,
             SUM(POW(0.5, a.rn - b.rn)) AS sw,
             SUM(POW(0.5, a.rn - b.rn) * POW(0.5, a.rn - b.rn)) AS sw2,
             SUM(POW(0.5, a.rn - b.rn) * b.value) AS swx,
             SUM(POW(0.5, a.rn - b.rn) * b.value * b.value) AS swx2
      FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn <= a.rn
      GROUP BY a.event_id
    )
    SELECT event_id,
           ROUND(CASE WHEN sw * sw > sw2 THEN
             GREATEST(swx2 / sw - (swx / sw) * (swx / sw), 0)
               * (sw * sw) / (sw * sw - sw2) END, 6) AS v_ewmvar,
           ROUND(CASE WHEN sw * sw > sw2 THEN
             SQRT(GREATEST(swx2 / sw - (swx / sw) * (swx / sw), 0)
               * (sw * sw) / (sw * sw - sw2)) END, 6) AS v_ewmstd
    FROM s
    """,
)
def group_ewm_var_std_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted variance + std, α=0.5 (exact decay powers;
    round-6 absorbs association-order double noise between the bounded
    fold and the O(n²) SQL oracle)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    out = gt.group_ewm_var(ev, "user_id", ["event_id"], ["value"], alpha=0.5)
    out = gt.group_ewm_var(out, "user_id", ["event_id"], ["value"], alpha=0.5,
                           std=True)
    return out.select(
        "event_id",
        F.round("value_ewmvar", 6).alias("v_ewmvar"),
        F.round("value_ewmstd", 6).alias("v_ewmstd"),
    )


# ----------------------------------------------------------------- take_1d


@register(
    "take_1d",
    oracle="""
    WITH vals AS (
      SELECT l_extendedprice AS val,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_extendedprice) - 1 AS pos
      FROM lineitem
    ), n AS (SELECT COUNT(*) AS n FROM lineitem),
    idx AS (
      SELECT event_id AS pos,
             CASE WHEN event_type = 'error' THEN -1
                  ELSE (user_id * 131) % (SELECT n FROM n) END AS src_idx
      FROM events
    )
    SELECT idx.pos, idx.src_idx,
           COALESCE(vals.val, -1.0) AS taken
    FROM idx LEFT JOIN vals
      ON CASE WHEN idx.src_idx >= 0 THEN idx.src_idx END = vals.pos
    """,
)
def take_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take_1d gather (`lib.rs:37-168`): out[i] = values[indexer[i]],
    -1 → fill_value (a real parameter here; the reference hardcodes 0,
    §2.4 #7). Indexer joins row-numbered values; Catalyst/AQE pick
    broadcast vs shuffle."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    n = li.count()  # scalar table size, like the reference's len(values)
    vals = tk.with_position(li, ["l_orderkey", "l_linenumber", "l_extendedprice"]).select(
        "pos", F.col("l_extendedprice").alias("val")
    )
    idx = ev.select(
        F.col("event_id").alias("pos"),
        F.when(F.col("event_type") == "error", F.lit(-1))
        .otherwise((F.col("user_id") * 131) % F.lit(n))
        .cast("long")
        .alias("src_idx"),
    )
    out = tk.take_1d(vals, "val", idx, "src_idx", out_col="taken",
                     fill_value=-1.0)
    return out.select("pos", "src_idx", "taken")


# ----------------------------------------------------------------- take_2d


@register(
    "take_2d",
    oracle="""
    SELECT l_tax AS c0, l_quantity AS c1, l_tax AS c2, l_orderkey AS c3,
           l_linenumber AS c4
    FROM lineitem
    """,
)
def take_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take_2d_axis1 / take_2d_unsafe (`algos.rs:48-62`,
    `lib.rs:170-209`): column gather by position — a pure SELECT list
    (duplicates allowed, like a repeated indexer entry); the rayon
    parallel variant is subsumed by task parallelism."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # lineitem columns: 0=l_orderkey 1=l_partkey 2=l_suppkey
    # 3=l_linenumber 4=l_quantity ... 7=l_tax
    cols = li.columns
    idx = [cols.index("l_tax"), cols.index("l_quantity"), cols.index("l_tax"),
           cols.index("l_orderkey"), cols.index("l_linenumber")]
    out = tk.take_columns(li, idx)
    return out.toDF(*[f"c{i}" for i in range(len(idx))])


# ------------------------------------------------------------------ zscore


@register(
    "group_zscore",
    oracle="""
    WITH s AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             CAST(FLOOR(l_extendedprice * 1e6) AS HUGEINT) AS fx,
             l_suppkey
      FROM lineitem
    ), g AS (
      SELECT l_suppkey, COUNT(*) AS n, SUM(fx) AS sx, SUM(fx * fx) AS sxx
      FROM s GROUP BY l_suppkey
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN n > 1
                  AND CAST(n * sxx - sx * sx AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE) > 0 THEN
             (l_extendedprice
              - (CAST(sx AS DOUBLE) / 1e6) / CAST(n AS DOUBLE))
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                     / CAST(n * (n - 1) AS DOUBLE)) / 1e6) END, 6) AS z
    FROM s JOIN g USING (l_suppkey)
    """,
)
def group_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby.transform zscore: per-row standardization against group
    stats computed as whole-partition window aggregates — stats and
    rows share one shuffle, no agg+join-back. Fixed-point power sums
    keep it bit-deterministic (decimal on Spark, HUGEINT in the
    oracle)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    out = gt.group_zscore(li, "l_suppkey", ["l_extendedprice"])
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice_z", 6).alias("z"),
    )


@register(
    "group_interpolate",
    oracle=f"""
    WITH e AS ({_EV_NULLABLE}),
    r1 AS (
      SELECT user_id, event_id, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM e
    ), r2 AS (
      SELECT user_id, event_id, v, rn,
             LAST_VALUE(v IGNORE NULLS) OVER wb AS prev_v,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS next_v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER wb AS prev_rn,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER wf AS next_rn
      FROM r1
      WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN prev_v IS NULL THEN NULL
                      WHEN next_v IS NULL THEN prev_v
                      ELSE prev_v + (next_v - prev_v)
                           * (CAST(rn - prev_rn AS DOUBLE)
                              / CAST(next_rn - prev_rn AS DOUBLE))
                 END, 6) AS v_interp
    FROM r2
    """,
)
def group_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of NULL runs over ordered per-user events
    (pandas interpolate semantics: leading NULLs stay, trailing hold) —
    pure window algebra, one sort; the oracle spells out the identical
    anchor/blend expressions."""
    ev = _ev_nullable(spark, sf_dir)
    out = gt.group_interpolate(ev, "user_id", "event_id", ["v"])
    return out.select(
        "user_id", "event_id", F.round("v_interp", 6).alias("v_interp"))
