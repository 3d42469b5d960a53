"""Bucketed co-located join: writing both fact tables bucketed on the
join key must remove every Exchange from the join plan — the layout
investment that makes repeated fact-fact joins shuffle-free at scale."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.sources import load_table
from pandas_rust_algos_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # tables land in the default spark-warehouse/ (gitignored);
    # warehouse.dir is a static conf and can't move per-test
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(od, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _detail_nodes(plan: str, node: str) -> list[str]:
    return re.findall(rf"^\(\d+\) {node}$", plan, flags=re.M)


def test_bucketed_join_has_no_exchange(spark, bucketed):
    ot, lt = bucketed
    od, li = read_bucketed(spark, ot), read_bucketed(spark, lt)
    # disable AQE broadcast demotion so the plan shape is deterministic
    # for the assertion; bucketing matters precisely when both sides are
    # too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = od.join(li, od.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan
        # the join itself must be exchange-free; the only allowed
        # shuffle is the final tiny aggregation on o_orderpriority
        n_exchanges = len(_detail_nodes(plan, "Exchange"))
        assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan[:1500]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed):
    ot, lt = bucketed
    od_b, li_b = read_bucketed(spark, ot), read_bucketed(spark, lt)
    od, li = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")

    def agg(o, l):
        return sorted(
            (r["o_orderpriority"], r["n"])
            for r in o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    assert agg(od_b, li_b) == agg(od, li)
