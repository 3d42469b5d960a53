"""Partitioned parquet sink: layout, round-trip, and read-back pruning."""

from __future__ import annotations

import glob
import os

import pytest

from pandas_rust_algos_spark.sources import load_table
from pandas_rust_algos_spark.sources.sinks import (
    partition_dirs,
    read_partitioned,
    write_partitioned,
)


@pytest.fixture(scope="module")
def written(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(
        ev, path,
        partition_by=["event_type"],
        sort_within=["ts"],
        max_records_per_file=100_000,
    )
    return path, ev


def test_partition_layout_and_roundtrip(spark, written):
    path, ev = written
    types = sorted(r["event_type"] for r in
                   ev.select("event_type").distinct().collect())
    assert partition_dirs(path) == [f"event_type={t}" for t in types]
    back = read_partitioned(spark, path)
    assert back.count() == ev.count()
    # partition column is recovered from the directory names
    assert sorted(r["event_type"] for r in
                  back.select("event_type").distinct().collect()) == types


def test_single_file_per_partition(written):
    """The pre-write repartition prevents the small-files explosion:
    each partition directory holds one file at this volume."""
    path, _ = written
    for d in partition_dirs(path):
        files = glob.glob(os.path.join(path, d, "*.parquet"))
        assert len(files) == 1, f"{d}: {files}"


def test_readback_prunes_partitions(spark, written):
    """A predicate on the partition column must prune at planning time:
    the scan's partition count is 1, not n_types."""
    path, ev = written
    one_type = ev.select("event_type").distinct().limit(1).collect()[0][0]
    back = read_partitioned(spark, path).where(f"event_type = '{one_type}'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # FileSourceScanExec reports pruned partition count
    expected = ev.where(f"event_type = '{one_type}'").count()
    assert back.count() == expected
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
