"""Generic format sources/sinks: CSV/JSON/ORC roundtrips with explicit
schemas, the no-inference contract, and land-and-convert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.sources import (
    convert_to_parquet,
    load_table,
    read_source,
    write_sink,
)

SCHEMA = "n_nationkey long, n_name string, n_regionkey long"


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / f"nation_{fmt}")
    write_sink(src, path, fmt)
    got = read_source(spark, path, fmt,
                      schema=SCHEMA if fmt in ("csv", "json") else None)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, src.collect()))


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_reads_require_schema(spark, tmp_path, fmt):
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, str(tmp_path), fmt)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="fmt must be one of"):
        read_source(spark, str(tmp_path), "avro")


def test_convert_to_parquet_enables_pushdown(spark, sf_dir, tmp_path):
    """Landed CSV converted once; the converted scan must show parquet
    PushedFilters for a predicate (the reason the conversion exists)."""
    src = _nation(spark, sf_dir)
    csv_path = str(tmp_path / "landed_csv")
    write_sink(src, csv_path, "csv")
    pq = convert_to_parquet(
        spark, csv_path, "csv", SCHEMA, str(tmp_path / "converted"))
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, src.collect()))
    plan = pq.where(F.col("n_regionkey") == 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "n_regionkey" in plan.split("PushedFilters")[1][:200]


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_orc")
    write_sink(src, path, "orc")
    plan = read_source(spark, path, "orc").where(
        F.col("n_nationkey") > 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan


def test_partitioned_csv_sink(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_by_region")
    write_sink(src, path, "csv", partition_by=["n_regionkey"])
    got = read_source(
        spark, path, "csv",
        schema="n_nationkey long, n_name string",
        basePath=path,
    )
    # partition column comes back from directory names
    assert "n_regionkey" in got.columns
    assert got.count() == src.count()


def test_sql_face_matches_dataframe_face(spark, sf_dir):
    """spark.sql over registered views must plan the same scans (with
    pushdown) as the DataFrame face and return identical results."""
    from pandas_rust_algos_spark.sources import sql

    got = sql(spark, sf_dir, """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem WHERE l_quantity < 10
        GROUP BY l_returnflag
    """)
    li = load_table(spark, sf_dir, "lineitem")
    want = (li.where(F.col("l_quantity") < 10)
            .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters")[1][:250]
