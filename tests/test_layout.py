"""Z-order layout: Morton codes must actually buy multi-column file
skipping — asserted from real parquet footer min/max stats, not from
the plan."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.sources import load_table
from pandas_rust_algos_spark.sources.layout import write_zordered, zorder_column


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet footers."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mns.append(c.statistics.min)
                    mxs.append(c.statistics.max)
        if mns:
            out.append((min(mns), max(mxs)))
    return out


def _files_skipped(ranges: list[tuple], lo, hi) -> int:
    return sum(1 for mn, mx in ranges if mx < lo or mn > hi)


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity")

    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, ["l_orderkey", "l_suppkey"], num_files=8)

    # baseline: single-column sort — perfect on l_orderkey, blind on
    # l_suppkey
    lpath = str(tmp_path / "linear")
    (li.repartitionByRange(8, "l_orderkey")
       .sortWithinPartitions("l_orderkey").write.parquet(lpath))

    # nothing lost
    assert spark.read.parquet(zpath).count() == li.count()

    row = li.agg(F.min("l_orderkey").alias("omn"), F.max("l_orderkey").alias("omx"),
                 F.min("l_suppkey").alias("smn"), F.max("l_suppkey").alias("smx")
                 ).collect()[0]

    # a narrow slice in each dimension (~1/8 of the domain)
    o_lo = row["omn"]
    o_hi = row["omn"] + max(1, (row["omx"] - row["omn"]) // 8)
    s_lo = row["smn"]
    s_hi = row["smn"] + max(1, (row["smx"] - row["smn"]) // 8)

    z_o = _files_skipped(_file_ranges(zpath, "l_orderkey"), o_lo, o_hi)
    z_s = _files_skipped(_file_ranges(zpath, "l_suppkey"), s_lo, s_hi)
    l_s = _files_skipped(_file_ranges(lpath, "l_suppkey"), s_lo, s_hi)

    # z-order skips files for predicates on BOTH dimensions; the
    # single-column layout cannot skip on the second one
    assert z_o > 0
    assert z_s > 0
    assert l_s == 0


def test_zorder_column_rejects_overflow_and_empty(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_column(li, ["l_orderkey", "l_suppkey"], bits=32)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_column(li, [])


def test_zorder_constant_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (1, None)], "a int, b int")
    z = df.select(zorder_column(df, ["a", "b"]).alias("z")).collect()
    assert all(r["z"] == 0 for r in z)
