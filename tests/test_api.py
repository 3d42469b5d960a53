"""The pandas-style groupby facade: every method binds to its operator
and returns a runnable plan; order-dependent methods demand order."""

from __future__ import annotations

import pytest

from pandas_rust_algos_spark import groupby


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 1.0, 10), ("a", 2, None, 20), ("a", 3, 3.0, 30),
            ("b", 1, 7.0, 40), ("b", 2, 5.0, 50),
        ],
        "k string, ord int, v double, w int",
    )


def test_reductions_run_and_match(df):
    gb = groupby(df, "k")
    assert {tuple(r) for r in gb.sum("v").collect()} == {("a", 4.0), ("b", 12.0)}
    assert {tuple(r) for r in gb.mean("v").collect()} == {("a", 2.0), ("b", 6.0)}
    assert {tuple(r) for r in gb.nunique("v").collect()} == {("a", 2), ("b", 2)}
    desc = {r["k"]: r["count"] for r in gb.describe("v").collect()}
    assert desc == {"a": 2, "b": 2}
    q = gb.quantile("v", 0.5).collect()
    assert {(r["k"], r["quantile"]) for r in q} == {("a", 2.0), ("b", 6.0)}


def test_every_reduction_method_smokes(df):
    gb = groupby(df, "k", order="ord")
    for call in (
        lambda: gb.count("v"), lambda: gb.prod("v"), lambda: gb.median("v"),
        lambda: gb.min("v"), lambda: gb.max("v"), lambda: gb.var("v"),
        lambda: gb.std("v"), lambda: gb.sem("v"), lambda: gb.skew("v"),
        lambda: gb.first("v"), lambda: gb.last("v"), lambda: gb.nth(2, "v"),
        lambda: gb.ohlc("v"), lambda: gb.idxmax("v", "ord"),
        lambda: gb.idxmin("v", "ord"),
    ):
        assert call().count() == 2


def test_transforms_need_order(df):
    gb = groupby(df, "k")
    with pytest.raises(ValueError, match="order"):
        gb.cumsum("v")


def test_transforms_run(df):
    gb = groupby(df, "k", order="ord")
    out = {(r["k"], r["ord"]): r["v_cumsum"] for r in gb.cumsum("v").collect()}
    assert out[("a", 3)] == 4.0 and out[("a", 2)] is None
    shifted = {(r["k"], r["ord"]): r["v_shift"] for r in gb.shift("v").collect()}
    assert shifted[("a", 2)] == 1.0 and shifted[("a", 1)] is None
    filled = {(r["k"], r["ord"]): r["v_filled"] for r in gb.ffill("v").collect()}
    assert filled[("a", 2)] == 1.0
    ranked = {(r["k"], r["ord"]): r["rank"] for r in gb.rank("v").collect()}
    assert ranked[("b", 1)] == 2.0
    rolled = gb.rolling("v", window=2, aggs=("sum",), min_periods=1)
    assert rolled.count() == df.count()
    expanded = gb.expanding("v", aggs=("count",))
    assert expanded.count() == df.count()


def test_bool_columns(spark):
    gb = groupby(
        spark.createDataFrame(
            [("a", True), ("a", False), ("b", True)], "k string, v boolean"),
        "k")
    assert {tuple(r) for r in gb.any("v").collect()} == {("a", True), ("b", True)}
    assert {tuple(r) for r in gb.all("v").collect()} == {("a", False), ("b", True)}


def test_interpolate_via_facade(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0)],
        "k string, ord int, v double")
    out = {r["ord"]: r["v_interp"]
           for r in groupby(df, "k", order="ord").interpolate("v").collect()}
    assert out == {1: 1.0, 2: 2.0, 3: 3.0}


def test_ewm_via_facade(spark):
    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, None), ("a", 3, 4.0)],
        "k string, ord int, v double")
    gb = groupby(df, "k", order="ord")
    # adjust=False, ignore_na=False, carry: y1=2, y2 carries 2,
    # y3 = (.65^2*2 + .35*4)/(.65^2 + .35) ≈ 2.9086
    out = {r["ord"]: r["v_ewm"]
           for r in gb.ewm_mean("v", alpha=0.35, adjust=False,
                                ignore_na=False, na_output="carry").collect()}
    assert out[1] == 2.0 and out[2] == 2.0
    assert abs(out[3] - (0.65**2 * 2 + 0.35 * 4) / (0.65**2 + 0.35)) < 1e-12
    assert gb.ewm_var("v", alpha=0.5).count() == 3
    assert gb.ewm_std("v", alpha=0.5).count() == 3
