"""Scalar-function surface gate queries.

The reference has NO scalar functions at all — no string/date/math/
array/JSON expressions anywhere (SURVEY §2.3, verified over all seven
source files). A complete engine needs them, so this module pins the
surface with oracle-checked queries: every expression here is a
Catalyst builtin (whole-stage codegen, no Python), chosen so the DuckDB
twin is bit-deterministic — exact string/date/integer functions, IEEE
correctly-rounded sqrt, round-6 only where float representation is
inherent (array elements).

JSON extraction lives in ``queries_events.events_json_props``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_rust_algos_spark.plans.registry import register
from pandas_rust_algos_spark.session import tune
from pandas_rust_algos_spark.sources import load_table


@register(
    "scalar_functions",
    oracle=r"""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS prio_upper,
           LENGTH(o_orderpriority) AS prio_len,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           REGEXP_EXTRACT(o_orderpriority, '(\d+)', 1) AS prio_num,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent,
           YEAR(o_orderdate) AS y,
           MONTH(o_orderdate) AS m,
           DAYOFMONTH(o_orderdate) AS d,
           CAST(FLOOR(o_totalprice / 100) AS BIGINT) AS price_bucket,
           SQRT(CAST(o_totalprice AS DOUBLE)) AS price_sqrt,
           ABS(CAST(0 AS DOUBLE) - o_totalprice) AS price_abs
    FROM orders
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface in one pass — all JVM builtins
    inside whole-stage codegen. sqrt is IEEE correctly-rounded (exact
    cross-engine); floor/abs/date-part/string ops are exact by
    construction, so nothing here needs tolerance rounding."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.regexp_extract("o_orderpriority", r"(\d+)", 1).alias("prio_num"),
        F.when(F.col("o_orderpriority").startswith("1"), F.lit(1))
        .otherwise(F.lit(0)).alias("is_urgent"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.floor(F.col("o_totalprice") / 100).alias("price_bucket"),
        F.sqrt(F.col("o_totalprice").cast("double")).alias("price_sqrt"),
        F.abs(F.lit(0.0) - F.col("o_totalprice")).alias("price_abs"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim,
           ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE),
                 6) AS head_sum
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface over the embeddings table: size, indexing,
    max/min (exact element picks), and an explicit fixed-order 4-term
    sum (same expression tree both engines — no fold-order ambiguity).
    round-6 absorbs float32→double display representation only."""
    tune(spark)
    e = load_table(spark, sf_dir, "embeddings")

    def d(i: int):
        return F.element_at("embedding", i).cast("double")

    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.round(d(1), 6).alias("first_dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_dim"),
        F.round(d(1) + d(2) + d(3) + d(4), 6).alias("head_sum"),
    )


@register(
    "try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 5) END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                         ELSE '123' END AS INTEGER) AS safe_cast,
           CASE WHEN o_orderkey > 7 THEN NULL
                ELSE o_orderkey + 9223372036854775800 END AS safe_add,
           [1, 2, 3][4] AS safe_oob
    FROM orders
    """,
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safety surface: Spark 4 runs with ANSI mode ON, so
    division by zero / overflow / bad casts THROW by default — the
    ``try_*`` family is the production form for dirty data (NULL
    instead of a failed 100 TB job). The oracle states the same
    semantics with explicit guards (plus DuckDB's natively-NULL
    out-of-bounds list access), pinning: divide-by-zero → NULL, string
    cast failure → NULL, BIGINT overflow → NULL, array index past the
    end → NULL."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"),
                     F.col("o_orderkey") % 5).alias("safe_div"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("not-a-number"))
        .otherwise(F.lit("123")).try_cast("int").alias("safe_cast"),
        F.try_add(F.col("o_orderkey"),
                  F.lit(9223372036854775800)).alias("safe_add"),
        F.try_element_at(F.array(F.lit(1), F.lit(2), F.lit(3)),
                         F.lit(4)).alias("safe_oob"),
    )


_RCTE_SQL = """
    WITH RECURSIVE walk(node, root, depth) AS (
      SELECT n_nationkey, n_nationkey, 0
      FROM nation WHERE n_nationkey < 5
      UNION ALL
      SELECT n.n_nationkey, w.root, w.depth + 1
      FROM nation n
      JOIN walk w
        ON CAST(FLOOR((n.n_nationkey - 5) / 4.0) AS BIGINT) = w.node
       AND n.n_nationkey >= 5
    )
    SELECT root, COUNT(*) AS n_nodes, MAX(depth) AS max_depth,
           CAST(SUM(node) AS BIGINT) AS sum_nodes
    FROM walk GROUP BY root
"""


@register("recursive_cte_tree", oracle=_RCTE_SQL)
def recursive_cte_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE surface (new in Spark 4): hierarchy walk over a
    synthetic 25-node forest on nation (node n's parent is
    ``floor((n-5)/4)``; nodes 0-4 are roots), computing per-root
    subtree size, depth, and an exact membership sum. The oracle is
    the IDENTICAL SQL text on DuckDB — the gate pins that the engine's
    ``WITH RECURSIVE`` speaks the standard dialect.

    Scale note: Spark executes recursive CTEs as driver-coordinated
    iteration; for data-sized graphs use the engine's iterative
    DataFrame operators (``dup_clusters`` label propagation,
    ``graph.pagerank_fixed``) whose per-round persistence and
    checkpointing are explicit. This surface is for hierarchy/BOM
    walks whose frontier is metadata-sized."""
    from pandas_rust_algos_spark.sources import sql as run_sql

    tune(spark)
    return run_sql(spark, sf_dir, _RCTE_SQL)


@register(
    "map_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity * 2 > 25.0 THEN 1 ELSE 0 END
             + CASE WHEN l_extendedprice * 2 > 25.0 THEN 1 ELSE 0 END
             + CASE WHEN l_discount * 2 > 25.0 THEN 1 ELSE 0 END
             AS n_large,
           l_quantity * 2 AS q2,
           CASE WHEN l_discount * 2 > 25.0
                THEN l_discount * 2 END AS d2_if_large
    FROM lineitem
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType expression surface: build a map from arrays, rescale
    every value with ``transform_values``, keep large entries with
    ``map_filter``, read back with ``element_at``/``map_contains_key``.
    The oracle states the expected SEMANTICS directly over the base
    columns (DuckDB's map calculus differs syntactically; the values
    must not) — doubling and comparisons are exact double ops, so the
    hash compare is bit-level like everything else."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("q"), F.lit("p"), F.lit("d")),
        F.array("l_quantity", "l_extendedprice", "l_discount"),
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    large = F.map_filter(doubled, lambda _, v: v > 25.0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.size(large).alias("n_large"),
        F.element_at(doubled, "q").alias("q2"),
        F.when(F.map_contains_key(large, "d"),
               F.element_at(large, "d")).alias("d2_if_large"),
    )


_GBALL_SQL = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 1e6) AS BIGINT))
                AS DOUBLE) / 1e6 AS revenue
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
"""


@register("group_by_all", oracle=_GBALL_SQL)
def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern-SQL ergonomics pin: ``GROUP BY ALL`` (group on every
    non-aggregate select item) and ``ORDER BY ALL`` run as the
    IDENTICAL text on both engines — the dialect conveniences an
    analyst coming from DuckDB expects to just work."""
    from pandas_rust_algos_spark.sources import sql as run_sql

    tune(spark)
    return run_sql(spark, sf_dir, _GBALL_SQL)


@register(
    "date_interval_functions",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate + INTERVAL 90 DAY AS DATE),
                    '%Y-%m-%d') AS due_date,
           STRFTIME(CAST(DATE_TRUNC('month', o_orderdate) AS DATE),
                    '%Y-%m-%d') AS month_start,
           STRFTIME(CAST(LAST_DAY(o_orderdate) AS DATE),
                    '%Y-%m-%d') AS month_end,
           DATEDIFF('day', DATE '1995-01-01',
                    CAST(o_orderdate AS DATE)) AS days_since_epoch0,
           CAST(DAYOFWEEK(o_orderdate) AS INT) AS dow,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           CAST(WEEKOFYEAR(o_orderdate) AS INT) AS iso_week
    FROM orders
    """,
)
def date_interval_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic surface: interval addition, truncation,
    month boundaries, day diffs, and the calendar parts whose
    conventions differ across engines unless pinned — DAYOFWEEK
    (Spark: 1=Sunday; DuckDB: 0=Sunday — the Spark side subtracts 1 to
    meet it) and ISO week numbers. Dates emit as yyyy-MM-dd STRINGS:
    both engines agree on the value but surface different pandas dtypes
    (python date vs datetime64), which would break the repr-level hash
    even with equal values."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90),
                      "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"),
                      "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"),
                      "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.to_date(F.lit("1995-01-01")))
        .alias("days_since_epoch0"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
    )


@register(
    "string_functions_ext",
    oracle="""
    SELECT o_orderkey,
           SPLIT_PART(o_orderpriority, '-', 2) AS prio_word,
           LEVENSHTEIN(o_orderpriority, '1-URGENT') AS dist_urgent,
           TRANSLATE(o_orderpriority, '-', '_') AS underscored,
           REVERSE(o_orderpriority) AS rev,
           LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded,
           CAST(STRPOS(o_orderpriority, 'URGENT') AS INT) AS urgent_at,
           REPEAT(SUBSTRING(o_orderpriority, 1, 1), 3) AS tripled
    FROM orders
    """,
)
def string_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: split_part, levenshtein (the same DP
    distance both engines), translate, reverse, lpad, position,
    repeat — the remainder of the everyday string calculus beyond the
    scalar_functions gate. All exact string/int outputs."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.split_part(p, F.lit("-"), F.lit(2)).alias("prio_word"),
        F.levenshtein(p, F.lit("1-URGENT")).alias("dist_urgent"),
        F.translate(p, "-", "_").alias("underscored"),
        F.reverse(p).alias("rev"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded"),
        F.instr(p, "URGENT").cast("int").alias("urgent_at"),
        F.repeat(F.substring(p, 1, 1), 3).alias("tripled"),
    )


@register(
    "regr_aggregates",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), a AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM b GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) / 100, 6) AS slope,
           ROUND(CAST(sy AS DOUBLE) / n / 100
                 - (CAST(n*sxy - sx*sy AS DOUBLE)
                    / CAST(n*sxx - sx*sx AS DOUBLE) / 100)
                   * (CAST(sx AS DOUBLE) / n), 6) AS intercept,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 * CAST(n*sxy - sx*sy AS DOUBLE)
                 / (CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
    FROM a
    """,
)
def regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope / intercept / R²) of
    extendedprice on quantity per returnflag, computed from EXACT
    integer moment sums: x as whole units, y as cents, and the five
    moments (Σx, Σy, Σxy, Σx², Σy²) accumulated in decimal(38,0) —
    exact and associative, so a 32-way Spark run and single-threaded
    DuckDB (HUGEINT sums) agree bit-for-bit, unlike the native
    ``regr_slope``/``regr_r2`` whose float accumulation is
    partitioning-dependent (a unit test pins this algebra ≈ the native
    aggregates). The slope/intercept/R² doubles then derive from the
    same expression tree on both engines.

    Scale: one shuffle (partial moments map-side combined); decimal(38)
    headroom carries Σy² past the long range at ~9e23 rows/group.
    Reference: no regression surface (SURVEY §2.3) — driver-brief
    analytics extension."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")

    def dec(c):
        return c.cast("decimal(38,0)")

    a = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    num = (n_dec * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n_dec * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n_dec * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope_raw = num / den / 100
    return a.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(slope_raw, 6).alias("slope"),
        F.round(
            F.col("sy").cast("double") / F.col("n") / 100
            - slope_raw * (F.col("sx").cast("double") / F.col("n")),
            6,
        ).alias("intercept"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )
