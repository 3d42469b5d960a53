"""Relational gate queries — joins/sorts/top-k/set-style operators over
the TPC-H-ish star schema.

The reference has no joins (SURVEY §2.3): its only join-like primitive
is the positional gather pandas uses to materialize join results. Here
Catalyst provides the join algorithms; our job is to *shape the plans
for 100 TB*:

- dimension tables (region/nation/customer/supplier/part) are
  explicitly ``F.broadcast`` — no shuffle of the fact table for dims
  that fit in memory at any realistic scale;
- fact-fact joins (orders⨝lineitem) shuffle on the join key once, and
  aggregations that follow reuse that partitioning where possible;
- the as-of join is the union-sort trick: one shuffle+sort of
  events∪orders on (key, time), running last-non-null — no row
  explosion, no per-key driver loop; this is THE scalable pattern for
  temporal alignment of two big tables.

Revenue-style sums use decimal accumulation (registry rule 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandas_rust_algos_spark.plans.registry import dsum, register
from pandas_rust_algos_spark.session import tune
from pandas_rust_algos_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tune(spark)
    return [load_table(spark, sf_dir, n) for n in names]


_REVENUE = "l_extendedprice * (1 - l_discount)"


# ------------------------------------------------------------ Q1 (flagship)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')} AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           {dsum(_REVENUE)} AS sum_disc_price,
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {dsum('l_quantity')} / COUNT(l_quantity) AS avg_qty,
           {dsum('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
           {dsum('l_discount')} / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship: one scan with
    the shipdate predicate pushed to parquet, partial-agg before the
    6-group shuffle; exercises sum/mean/count in one pass."""
    (li,) = _t(spark, sf_dir, "lineitem")

    def d(c):
        return F.sum(F.floor(c * F.lit(1e6)).cast("long")).cast("double") / F.lit(1e6)

    price, disc, tax, qty = (F.col(c) for c in
                             ("l_extendedprice", "l_discount", "l_tax", "l_quantity"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            d(qty).alias("sum_qty"),
            d(price).alias("sum_base_price"),
            d(price * (1 - disc)).alias("sum_disc_price"),
            d(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            (d(qty) / F.count(qty)).alias("avg_qty"),
            (d(price) / F.count(price)).alias("avg_price"),
            (d(disc) / F.count(disc)).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -------------------------------------------------------------- Q3-shaped


@register(
    "q3_top_orders",
    oracle=f"""
    SELECT l_orderkey,
           {dsum(_REVENUE)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = (SELECT MIN(c_mktsegment) FROM customer)
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: broadcast the filtered customer dim into
    orders⨝lineitem, aggregate revenue, deterministic top-10
    (revenue DESC, orderkey ASC tie-break)."""
    cu, od, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    # scalar subquery as a broadcast join (no driver-side collect job):
    # the 1-row min-segment aggregate joins into the customer filter
    min_seg = cu.agg(F.min("c_mktsegment").alias("c_mktsegment"))
    cust = cu.join(F.broadcast(min_seg), "c_mktsegment").select("c_custkey")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# -------------------------------------------------------------- Q5-shaped


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {dsum(_REVENUE)} AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN supplier ON s_nationkey = n_nationkey
                JOIN lineitem ON l_suppkey = s_suppkey
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: the dim chain region→nation→supplier collapses
    to one broadcast into the lineitem scan — zero fact-table
    shuffles before the final small agg."""
    rg, na, su, li = _t(spark, sf_dir, "region", "nation", "supplier", "lineitem")
    dims = (
        rg.join(na, na.n_regionkey == rg.r_regionkey)
        .join(su, su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"))
    )


# -------------------------------------------------------------- Q2-shaped


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(min_price) AS best_price
      FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey,
           MIN(s.s_name) AS supplier_name,
           MIN(c.min_price) AS price
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.min_price = b.best_price
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    GROUP BY c.l_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated subquery — "the supplier offering
    each part at its minimum price". The correlation (price =
    per-part MIN) is expressed as an aggregation self-join, exactly
    Catalyst's own decorrelation; deterministic via MIN tie-breaks."""
    li, su = _t(spark, sf_dir, "lineitem", "supplier")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = costs.groupBy("l_partkey").agg(
        F.min("min_price").alias("best_price")
    ).withColumnRenamed("l_partkey", "b_partkey")
    return (
        costs.join(best, (F.col("l_partkey") == F.col("b_partkey"))
                   & (F.col("min_price") == F.col("best_price")))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.min("s_name").alias("supplier_name"),
             F.min("min_price").alias("price"))
    )


# -------------------------------------------------------------- Q4-shaped


@register(
    "q4_priority_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: EXISTS correlated predicate as a LEFT SEMI join
    (no right-side payload materialized), then a tiny priority agg."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        od.join(late, (od.o_orderkey == late.l_orderkey)
                & (late.l_shipdate > od.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# -------------------------------------------------------------- Q7-shaped


@register(
    "q7_nation_trade",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           {dsum(_REVENUE)} AS revenue
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped nation-pair trade volume by ship year. Both
    nation lookups ride broadcast dims (supplier→nation on lineitem,
    customer→nation on orders); the only big shuffle is the
    orders⨝lineitem key join, and the asymmetric-pair predicate
    (n1 < n2) prunes before the final agg."""
    li, su, na, od, cu = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "orders", "customer"
    )
    supp_dim = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_dim = (
        cu.join(na, cu.c_nationkey == na.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_dim), F.col("o_custkey") == cust_dim.c_custkey)
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"))
    )


# -------------------------------------------------------------- Q8-shaped


@register(
    "q8_market_share",
    oracle=f"""
    WITH market AS (
      SELECT EXTRACT(year FROM l_shipdate) AS o_year,
             FLOOR(l_extendedprice * (1 - l_discount) * 1e6)::BIGINT AS rev_fx,
             n_name
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON n_nationkey = s_nationkey
      WHERE p_type = (SELECT MIN(p_type) FROM part)
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN n_name = (SELECT MIN(n_name) FROM nation)
                    THEN rev_fx ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_fx) AS DOUBLE) AS mkt_share
    FROM market GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: within one part-type market, the
    revenue fraction supplied by one nation, per year. Scalar params
    (min part type / min nation name) are 1-row broadcast joins, never
    driver collects; the share is a ratio of two fixed-point sums in
    one aggregation pass (no self-join)."""
    li, pa, su, na = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    min_type = pa.agg(F.min("p_type").alias("p_type"))
    target_parts = pa.join(F.broadcast(min_type), "p_type").select("p_partkey")
    supp_nation = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    min_nation = na.agg(F.min("n_name").alias("target_nation"))
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.join(F.broadcast(target_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(min_nation))
        .groupBy(F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == F.col("target_nation"), rev)
                      .otherwise(F.lit(0))).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


# -------------------------------------------------------------- Q9-shaped


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name, EXTRACT(year FROM l_shipdate) AS o_year,
           {dsum('l_extendedprice * (1 - l_discount)'
                 ' - p_retailprice * l_quantity * 0.1')} AS profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product profit by supplier nation and year
    (the fixtures carry no partsupp, so supply cost is proxied as 10%
    of retail price — the plan shape is Q9's: two broadcast dims into
    the fact scan, profit expression evaluated pre-shuffle, small
    final agg)."""
    li, pa, su, na = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    supp_nation = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    parts = pa.select("p_partkey", "p_retailprice")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    profit = F.floor(amount * F.lit(1e6)).cast("long")
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("o_year"))
        .agg((F.sum(profit).cast("double") / F.lit(1e6)).alias("profit"))
    )


# -------------------------------------------------------------- Q14-shaped


@register(
    "q14_promo_share",
    oracle="""
    SELECT EXTRACT(year FROM l_shipdate) AS y,
           EXTRACT(month FROM l_shipdate) AS m,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
                  FLOOR(l_extendedprice * (1 - l_discount) * 1e6)::BIGINT
                  END) AS DOUBLE)
             / CAST(SUM(FLOOR(l_extendedprice * (1 - l_discount)
                              * 1e6)::BIGINT) AS DOUBLE)
             * 100 AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY y, m
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion revenue share per month: one
    broadcast dim join, the conditional and total revenue folded into
    a single aggregation pass (no self-join for the ratio)."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    parts = pa.select("p_partkey", "p_type")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("y"),
            F.month("l_shipdate").cast("long").alias("m"),
        )
        .agg(
            (F.sum(promo).cast("double")
             / F.sum(rev).cast("double") * F.lit(100.0)).alias("promo_share_pct")
        )
    )


# -------------------------------------------------------------- Q15-shaped


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(FLOOR(l_extendedprice * (1 - l_discount) * 1e6)::BIGINT)
               AS r_fx
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(r_fx AS DOUBLE) / 1e6 AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE r_fx = (SELECT MAX(r_fx) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the revenue "view" aggregates
    once and is reused for both the max (1-row broadcast, no collect)
    and the final filter — persisted because Catalyst would otherwise
    recompute the aggregation on both sides of its own self-join. The
    max compares exact fixed-point longs, so ties are real ties."""
    li, su = _t(spark, sf_dir, "lineitem", "supplier")
    rev_fx = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    from pandas_rust_algos_spark import cachelife

    # referenced by the max aggregate AND the final filter join in the
    # returned plan → tracked for deferred release
    rev = cachelife.track(
        li.groupBy("l_suppkey").agg(F.sum(rev_fx).alias("r_fx")).persist())
    best = rev.agg(F.max("r_fx").alias("r_fx"))
    return (
        rev.join(F.broadcast(best), "r_fx")
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("r_fx").cast("double") / F.lit(1e6)).alias("total_revenue"),
        )
    )


# -------------------------------------------------------------- Q17-shaped


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk, COUNT(*) AS n,
             SUM(FLOOR(l_quantity * 1e6)::BIGINT) AS sq_fx
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(FLOOR(l_extendedprice * 1e6)::BIGINT) AS DOUBLE)
             / 1e6 / 7.0 AS avg_yearly
    FROM lineitem JOIN pa ON l_partkey = pk
    WHERE CAST(FLOOR(l_quantity * 1e6) AS DOUBLE)
          < 0.2 * (CAST(sq_fx AS DOUBLE) / CAST(n AS DOUBLE))
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue from lineitems below 20% of their
    part's average quantity. The correlated scalar (per-part avg) is an
    aggregation broadcast back into the fact scan; the comparison runs
    on fixed-point values so both engines threshold identical doubles."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qty_fx = F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(qty_fx).alias("sq_fx")
    )
    avg_fx = F.col("sq_fx").cast("double") / F.col("n").cast("double")
    price_fx = F.floor(F.col("l_extendedprice") * F.lit(1e6)).cast("long")
    return (
        li.join(F.broadcast(pa), li.l_partkey == F.col("pk"))
        .where(qty_fx.cast("double") < F.lit(0.2) * avg_fx)
        .agg((F.sum(price_fx).cast("double") / F.lit(1e6) / F.lit(7.0))
             .alias("avg_yearly"))
    )


# -------------------------------------------------------------- Q22-shaped


@register(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(FLOOR(c_acctbal * 1e6)::BIGINT) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS n_cust,
           CAST(SUM(FLOOR(c_acctbal * 1e6)::BIGINT) AS DOUBLE) / 1e6
             AS total_bal
    FROM customer c
    WHERE CAST(FLOOR(c_acctbal * 1e6) AS DOUBLE)
          > (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: rich customers with no urgent order — a NOT
    EXISTS as LEFT ANTI join (nothing from the right side is ever
    materialized; the priority filter prunes the anti side before the
    shuffle), with the above-average threshold as a 1-row broadcast.
    (The original's "never ordered" is empty in these fixtures — every
    customer has orders — so the predicate narrows to urgent ones.)"""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    bal_fx = F.floor(F.col("c_acctbal") * F.lit(1e6)).cast("long")
    pos = cu.where(F.col("c_acctbal") > 0).agg(
        (F.sum(bal_fx).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("avg_fx")
    )
    return (
        cu.join(F.broadcast(pos))
        .where(bal_fx.cast("double") > F.col("avg_fx"))
        .join(od.where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(bal_fx).cast("double") / F.lit(1e6)).alias("total_bal"),
        )
    )


# -------------------------------------------------------------- Q18-shaped


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           {dsum('l_quantity')} AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(FLOOR(l_quantity * 1e6)::BIGINT) > 200 * 1000000
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders (HAVING over a grouped
    sum). The filter runs on the fixed-point sum itself — aggregate
    pushdown-friendly, and AQE sizes the single shuffle."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    qty = F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).alias("__q"))
        .where(F.col("__q") > 200 * 1_000_000)
        .select(
            "o_orderkey", "o_orderdate", "o_totalprice",
            (F.col("__q").cast("double") / F.lit(1e6)).alias("total_qty"),
        )
    )


# -------------------------------------------------------------- Q19-shaped


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {dsum(_REVENUE)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive bracket filter. The part-side
    conjuncts (brand, size) filter the dim BEFORE the broadcast and the
    lineitem-side quantity bound (derived common range 1..50) prunes
    the fact scan — Catalyst can't split an OR-of-ANDs across tables by
    itself, so the operator pre-factors it."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    brackets = [
        ("Brand#1", 1, 15, 1, 20),
        ("Brand#7", 10, 30, 10, 35),
        ("Brand#13", 20, 50, 20, 50),
    ]
    part_pred = None
    for b, slo, shi, _, _ in brackets:
        p = (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        part_pred = p if part_pred is None else (part_pred | p)
    parts = pa.where(part_pred).select("p_partkey", "p_brand", "p_size")
    qlo = min(b[3] for b in brackets)
    qhi = max(b[4] for b in brackets)
    joined = li.where(F.col("l_quantity").between(qlo, qhi)).join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    full = None
    for b, slo, shi, lo, hi in brackets:
        p = ((F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
             & F.col("l_quantity").between(lo, hi))
        full = p if full is None else (full | p)
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return joined.where(full).agg(
        (F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue")
    )


# -------------------------------------------------------------- Q10-shaped


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, {dsum(_REVENUE)} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item reporting: top-20 customers by
    lost revenue. The returnflag filter reaches the parquet scan;
    customer⨝nation broadcasts into the orders⨝lineitem join; the
    top-20 is a deterministic global sort-limit (TakeOrderedAndProject,
    never a full result sort)."""
    cu, od, li, na = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    cust = (
        cu.join(na, cu.c_nationkey == na.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ------------------------------------------------------- group sample


@register(
    "group_sample",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey FROM h WHERE rn <= 3
    """,
)
def group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas groupby.sample(n=3, random_state=...) made distributed
    AND reproducible: order each group by a keyed hash (md5 of the row
    key) and keep the first n — a uniform-without-replacement sample
    that's independent of partitioning, so re-runs and cluster
    re-sizes return identical rows. One shuffle (the window)."""
    (od,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.md5(F.col("o_orderkey").cast("string").cast("binary")),
        F.col("o_orderkey"),
    )
    return (
        od.select("o_custkey", "o_orderkey",
                  F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


# ------------------------------------------------------- group head/tail


@register(
    "group_head_tail",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rh,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rt
      FROM orders
    )
    SELECT o_custkey, o_orderkey, 'head' AS part FROM r WHERE rh <= 2
    UNION ALL
    SELECT o_custkey, o_orderkey, 'tail' AS part FROM r WHERE rt <= 2
    """,
)
def group_head_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas groupby.head(n)/tail(n): first/last n rows per group in a
    defined order — both directions share one shuffle (row_number over
    asc and desc orders on the same partitioning)."""
    from pyspark.sql.window import Window

    (od,) = _t(spark, sf_dir, "orders")
    wa = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey"))
    wd = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    base = od.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(wa).alias("rh"),
        F.row_number().over(wd).alias("rt"),
    )
    head = base.where(F.col("rh") <= 2).select(
        "o_custkey", "o_orderkey", F.lit("head").alias("part"))
    tail = base.where(F.col("rt") <= 2).select(
        "o_custkey", "o_orderkey", F.lit("tail").alias("part"))
    return head.unionByName(tail)


# ------------------------------------------------------------ range join


@register(
    "range_join",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS win_id, o_orderdate AS win_start,
             o_orderdate + INTERVAL 3 DAY AS win_end
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT win_id, COUNT(*) AS n_shipments,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem JOIN iv
      ON l_shipdate >= win_start AND l_shipdate < win_end
    GROUP BY win_id
    """,
)
def range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join without a key: lineitem ship events
    against sparse 3-day windows. Bucket banding turns the theta join
    into an equi-join on day buckets (operators/range_join.py) — the
    oracle's plain theta join is what we must NOT run distributed (it
    plans as broadcast-nested-loop: every point × every interval)."""
    from pandas_rust_algos_spark.operators.range_join import range_join

    li, od = _t(spark, sf_dir, "lineitem", "orders")
    iv = od.where(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("win_id"),
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("win_end"),
    )
    pts = li.select("l_orderkey", "l_shipdate")
    return (
        range_join(pts, "l_shipdate", iv, "win_start", "win_end",
                   bucket_seconds=86_400)
        .groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


# ------------------------------------------------------------- as-of join


@register(
    "asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             MAX(o_orderkey) AS o_orderkey,
             ARG_MAX(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each event matched to the
    user's latest order with o_orderdate <= ts.

    Spark lacks a native as-of join; the scalable pattern is the
    union-sort trick: tag both inputs, union, one shuffle+sort on
    (key, time, side) with right-side rows first at equal times, then
    running last-non-null of the right columns — O(n log n), no row
    explosion, works at any fan-in (vs the naive join+filter+argmax
    which explodes on hot keys). Orders are pre-deduped to one row per
    (custkey, orderdate) to make the match unique/deterministic.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    o = od.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = right.unionByName(left).select(
        "k", "side", "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("o_totalprice"),
    )
    return merged.where(F.col("side") == 1).select(
        "event_id", F.col("k").alias("user_id"), "o_orderkey", "o_totalprice"
    )


# -------------------------------------------------------- top-k per group


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — window row_number with a
    deterministic tie-break; at scale AQE handles per-key skew and the
    rank filter prunes before any further join."""
    (od,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------- semi/anti join


@register(
    "semi_anti_join",
    oracle="""
    SELECT c.c_custkey, 'has_urgent' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c.c_custkey, 'no_orders' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins — Catalyst executes both without
    materializing the right side's payload (existence-only probes)."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT")
    semi = cu.join(urgent, cu.c_custkey == urgent.o_custkey, "left_semi") \
        .select("c_custkey", F.lit("has_urgent").alias("tag"))
    anti = cu.join(od, cu.c_custkey == od.o_custkey, "left_anti") \
        .select("c_custkey", F.lit("no_orders").alias("tag"))
    return semi.unionByName(anti)


# ----------------------------------------------------------------- rollup


@register(
    "rollup_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum(_REVENUE)} AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total) — absent from the
    reference (§2.3), native in both engines."""
    (li,) = _t(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"),
             F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------- cube


@register(
    "cube_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum(_REVENUE)} AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all key subsets) — one pass; Catalyst
    expands to an Expand node feeding a single aggregation, not
    2^k separate scans."""
    (li,) = _t(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("revenue"),
             F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------- set ops


@register(
    "set_ops",
    oracle="""
    SELECT c_custkey, 'both' AS tag FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    UNION ALL
    SELECT c_custkey, 'urgent_only' AS tag FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (absent from the reference, SURVEY §2.3) —
    Catalyst executes both as semi/anti joins over distinct sets."""
    (od,) = _t(spark, sf_dir, "orders")
    urgent = od.where(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_custkey").alias("c_custkey"))
    low = od.where(F.col("o_orderpriority") == "5-LOW") \
        .select(F.col("o_custkey").alias("c_custkey"))
    both = urgent.intersect(low).select("c_custkey", F.lit("both").alias("tag"))
    # subtract = EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would keep keys whose multiplicity merely differs
    only = urgent.subtract(low) \
        .select("c_custkey", F.lit("urgent_only").alias("tag"))
    return both.unionByName(only)


# ------------------------------------------------------------------- Q6


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure filter + global agg — both range
    predicates push to the parquet scan; zero shuffles beyond the
    single-row final merge."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(F.floor(F.col("l_extendedprice") * F.col("l_discount")
                           * F.lit(1e6)).cast("long"))
             .cast("double") / F.lit(1e6)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ------------------------------------------------------------ salted agg


@register(
    "group_sum_salted",
    oracle=f"""
    SELECT l_returnflag,
           {dsum('l_quantity')} AS sum_qty,
           COUNT(l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def group_sum_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation
    (operators/skew_handling.py): 3 whale groups over 600k rows —
    exactly the tiny-group/hot-key shape where one reducer would
    otherwise absorb a whole group. Fixed-point sums make the
    two-phase merge bit-identical to the direct aggregation."""
    from pandas_rust_algos_spark.operators.skew_handling import salted_agg

    (li,) = _t(spark, sf_dir, "lineitem")
    fx = li.withColumn(
        "qty_fx", F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    )
    out = salted_agg(
        fx, "l_returnflag",
        {"sum_fx": ("sum", "qty_fx"), "n": ("count", "qty_fx")},
        num_salts=32,
    )
    return out.select(
        "l_returnflag",
        (F.col("sum_fx").cast("double") / F.lit(1e6)).alias("sum_qty"),
        "n",
    )


# ----------------------------------------------------- distinct aggregation


@register(
    "distinct_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(SUM(DISTINCT CAST(FLOOR(l_quantity * 1e6) AS BIGINT)) AS DOUBLE)
             / 1e6 AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation — Catalyst expands to a two-phase
    distinct+agg plan (partial distinct before the shuffle)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        (F.sum_distinct(F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long"))
         .cast("double") / F.lit(1e6)).alias("sum_distinct_qty"),
    )


# -------------------------------------------------------------- Q11-shaped


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6)
                      AS BIGINT)) AS value_fp
      FROM lineitem GROUP BY l_partkey
    )
    SELECT partkey, CAST(value_fp AS DOUBLE) / 1e6 AS value
    FROM pv WHERE value_fp * 1500 > (SELECT SUM(value_fp) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock identification (no partsupp in
    the fixtures, so part value is proxied by lineitem revenue): parts
    whose value exceeds 1/1500 of the global total. The global-total
    scalar subquery is a 1-row re-aggregation of the per-part sums
    broadcast back — no driver collect, no second fact scan; the
    threshold compare stays in exact int64 (value_fp·1500 vs total)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
    ).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(rev_fp).alias("value_fp")
    )
    total = per_part.agg(F.sum("value_fp").alias("total_fp"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_fp") * F.lit(1500) > F.col("total_fp"))
        .select("partkey",
                (F.col("value_fp").cast("double") / F.lit(1e6)).alias("value"))
    )


# -------------------------------------------------------------- Q12-shaped


@register(
    "q12_late_priority",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-priority audit (fixtures carry no
    l_shipmode/commitdate: line status stands in for mode, late =
    shipped >90 days after order). One fact-fact shuffle join on
    orderkey; both conditional counts fold into a single tiny agg —
    only (orderkey, priority, orderdate) leave the orders scan."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li.select("l_orderkey", "l_shipdate", "l_linestatus"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


# -------------------------------------------------------------- Q13-shaped


@register(
    "q13_order_distribution",
    oracle="""
    WITH c AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist FROM c GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: LEFT join
    with the filter folded into the join condition (customers with
    only urgent orders still count as 0), per-customer count reusing
    the join's hash partitioning on custkey (one shuffle per input),
    then a near-free re-agg of the tiny count column."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    filtered = od.where(F.col("o_orderpriority") != "1-URGENT") \
        .select("o_custkey", "o_orderkey")
    return (
        cu.select("c_custkey")
        .join(filtered, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# -------------------------------------------------------------- Q21-shaped


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting (late =
    shipped >365 days after a finished order). The classic form is two
    correlated EXISTS self-joins on lineitem (the oracle keeps that
    shape); here both collapse into per-order window aggregates —
    distinct-supplier and distinct-late-supplier sets over one
    partition-by-orderkey frame — so the fact table is shuffled ONCE
    and never self-joined: a line waits iff it is late, its order has
    >1 supplier, and the late-supplier set is exactly {its supplier}."""
    li, od, su = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    lines = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(od.where(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")).alias("late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    stats = lines.select(
        "*",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(F.collect_set(
            F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    return (
        stats.where(F.col("late") & (F.col("n_supp") > 1)
                    & (F.col("n_late_supp") == 1))
        .join(F.broadcast(su.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# -------------------------------------------------------------- Q16-shaped


@register(
    "q16_supplier_parts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped parts/supplier relationship count (fixtures
    carry no partsupp; distinct lineitem (part, supp) pairs stand in).
    The NOT IN excluded-supplier subquery is a broadcast LEFT ANTI
    join — never a shuffle of the fact side; part predicates ride the
    broadcast dim into the scan, and COUNT(DISTINCT) expands to
    Catalyst's two-phase partial-distinct plan."""
    pa, li, su = _t(spark, sf_dir, "part", "lineitem", "supplier")
    parts = pa.where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = su.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -------------------------------------------------------------- Q20-shaped


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name FROM supplier WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(FLOOR(l_quantity * 1e6) AS BIGINT)) > 100 * 1000000
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-inventory suppliers (no partsupp
    availqty: the threshold is a fixed 100-unit shipped quantity per
    (supplier, part) over 'small%' parts). Shape preserved: filtered
    dim broadcast into the fact scan, per-pair aggregate, then the IN
    becomes a LEFT SEMI join against the small qualifying-supplier
    set — supplier itself is never shuffled. Quantity compare in exact
    fixed-point micro-units."""
    su, li, pa = _t(spark, sf_dir, "supplier", "lineitem", "part")
    small_parts = pa.where(F.col("p_name").like("small%")).select("p_partkey")
    qfx = F.floor(F.col("l_quantity") * F.lit(1e6)).cast("long")
    heavy = (
        li.select("l_partkey", "l_suppkey", qfx.alias("qfx"))
        .join(F.broadcast(small_parts),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qfx").alias("qty_fx"))
        .where(F.col("qty_fx") > F.lit(100) * F.lit(1_000_000))
        .select("l_suppkey")
        .distinct()
    )
    return (
        su.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name")
    )


def _orders_asof_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right side for the directional as-of gates: one row per
    (custkey, orderdate), deterministic payload, DATE cast to the
    event clock's TIMESTAMP."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ts"),
            "o_orderkey",
        )
    )


_ASOF_ORACLE_CTE = """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), o AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot,
             MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
"""


@register(
    "asof_join_forward",
    oracle=_ASOF_ORACLE_CTE + """
    SELECT e.event_id, e.user_id, o.o_orderkey
    FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.ot >= e.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event matched to the user's NEXT order
    at-or-after its timestamp — the same union-sort scan as backward
    with time reversed (operators/asof.py merge_asof)."""
    from pandas_rust_algos_spark.operators.asof import merge_asof

    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    out = merge_asof(
        ev, _orders_asof_right(spark, sf_dir),
        on="ts", by="user_id", right_cols=["o_orderkey"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "o_orderkey")


@register(
    "asof_join_nearest",
    oracle=_ASOF_ORACLE_CTE + """
    , b AS (
      SELECT e.event_id, o.o_orderkey AS bk, o.ot AS bt
      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.ot <= e.ts
    ), f AS (
      SELECT e.event_id, o.o_orderkey AS fk, o.ot AS ft
      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.ot >= e.ts
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN ft IS NULL THEN bk
                WHEN bt IS NULL THEN fk
                WHEN (e.ts - bt) <= (ft - e.ts) THEN bk ELSE fk
           END AS o_orderkey
    FROM e JOIN b USING (event_id) JOIN f USING (event_id)
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (ties → backward, pandas-compatible): both
    directional scans share one partitioning; per-row absolute-distance
    pick. The oracle composes two DuckDB ASOF joins with the same tie
    rule."""
    from pandas_rust_algos_spark.operators.asof import merge_asof

    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    out = merge_asof(
        ev, _orders_asof_right(spark, sf_dir),
        on="ts", by="user_id", right_cols=["o_orderkey"],
        direction="nearest",
    )
    return out.select("event_id", "user_id", "o_orderkey")


@register(
    "snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
)
def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation of two snapshot versions (derived
    deterministically from the orders fixture: %3 deletions on one
    side, %5 on the other, %7 price bumps) — one full-outer hash join,
    null-safe compare (operators/reconcile.py)."""
    from pandas_rust_algos_spark.operators.reconcile import snapshot_diff

    tune(spark)
    od = load_table(spark, sf_dir, "orders")
    old = od.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice")
    new = od.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0,
               F.col("o_totalprice") + 100)
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    return snapshot_diff(old, new, "o_orderkey", ["o_totalprice"])


@register(
    "listagg_top_customers",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_name) AS rn
      FROM customer
    )
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY rn) AS top_names,
           CAST(COUNT(*) AS BIGINT) AS n_top,
           CAST(SUM(CAST(FLOOR(c_acctbal * 1e6) AS BIGINT)) AS BIGINT)
             AS balance_micros
    FROM ranked WHERE rn <= 8
    GROUP BY c_mktsegment
    """,
)
def listagg_top_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4's ``listagg … WITHIN GROUP``
    (ANSI SQL:2023) building the ranked top-8 customer roster per
    market segment as one delimited string. Determinism is the whole
    game for an ordered aggregate: the WITHIN GROUP key is the
    row_number from a totally-ordered window (balance DESC, name), so
    the concatenation order is unique and the string hashes
    identically on both engines (DuckDB: ``string_agg(… ORDER BY rn)``).
    One window sort-exchange per segment partition + one segment-keyed
    aggregation; balances sum in integer micro-units."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_name")
    ranked = cust.select(
        "c_mktsegment", "c_name", "c_acctbal",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 8)
    return ranked.groupBy("c_mktsegment").agg(
        F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY rn)")
        .alias("top_names"),
        F.count(F.lit(1)).alias("n_top"),
        F.sum(F.floor(F.col("c_acctbal") * F.lit(1e6)).cast("long"))
        .alias("balance_micros"),
    )
