"""Incremental materialized-view maintenance (sources/matview.py):
delta application over the change feed must reproduce a full
recompute BIT-exactly (fixed-point sums), across merge / delete /
append / group-moving updates, including NULL group keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.sources.matview import MaterializedSumView
from pandas_rust_algos_spark.sources.table_format import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _key(t):
    return (t[0] is None, t[0] or "", t[1:])


def _view_rows(view):
    return sorted(
        ((r["grp"], r["n"], r["v_sum_micro"]) for r in view.read().collect()),
        key=_key,
    )


def _full_recompute(view, tbl):
    return sorted(
        (
            (r["grp"], r["n"], r["v_sum_micro"])
            for r in view._aggregate(tbl.read()).collect()
        ),
        key=_key,
    )


@pytest.fixture()
def setup(spark, tmp_path):
    tbl = VersionedTable(spark, str(tmp_path / "base"), key_cols=["id"])
    tbl.create(_df(spark, [
        (1, "a", 1.5), (2, "a", 2.25), (3, "b", 10.0),
        (4, "b", -1.125), (5, None, 7.0),
    ]))
    view = MaterializedSumView(
        tbl, str(tmp_path / "view"), ["grp"], ["v"])
    return tbl, view


def test_full_build_matches_recompute(spark, setup):
    tbl, view = setup
    view.refresh()
    assert _view_rows(view) == _full_recompute(view, tbl)
    sums = {r["grp"]: r["v_sum"] for r in view.read_sums().collect()}
    assert sums["a"] == pytest.approx(3.75)


def test_incremental_equals_full_after_each_mutation(spark, setup):
    tbl, view = setup
    view.refresh()
    # merge: update (2 moves group a->b, value change), insert (6)
    tbl.merge(_df(spark, [(2, "b", 4.0), (6, "a", 100.0)]))
    view.refresh()
    assert _view_rows(view) == _full_recompute(view, tbl)
    # delete: whole group b shrinks; id 5 kills the NULL group
    tbl.delete(F.col("id").isin(3, 5))
    view.refresh()
    assert _view_rows(view) == _full_recompute(view, tbl)
    # append
    tbl.append(_df(spark, [(7, "c", 0.000001), (8, None, -2.5)]))
    view.refresh()
    assert _view_rows(view) == _full_recompute(view, tbl)
    # group 'b' still has members; NULL group reappeared via id 8
    groups = {r["grp"] for r in view.read().collect()}
    assert None in groups and "c" in groups


def test_empty_groups_dropped(spark, setup):
    tbl, view = setup
    view.refresh()
    tbl.delete(F.col("grp") == "b")
    view.refresh()
    assert "b" not in {r["grp"] for r in view.read().collect()}
    assert _view_rows(view) == _full_recompute(view, tbl)


def test_refresh_noop_when_current(spark, setup):
    tbl, view = setup
    v = view.refresh()
    assert view.refresh() == v  # no new commits -> same version, no write


def test_requires_key_cols(spark, tmp_path):
    tbl = VersionedTable(spark, str(tmp_path / "nk"))
    with pytest.raises(ValueError, match="key_cols"):
        MaterializedSumView(tbl, str(tmp_path / "v"), ["g"], ["v"])
