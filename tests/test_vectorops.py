"""Semantics tests for vector ops (int8 quantization, normalization)
and the token-budget sampler — error bounds, edge vectors, and the
determinism/nesting invariants the salted-md5 recipe promises."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import datasplit as ds
from pandas_rust_algos_spark.operators import vectorops as vo


@pytest.fixture(scope="module")
def vecs(spark):
    data = [
        (1, [1.0, -2.0, 3.5]),
        (2, [0.0, 0.0, 0.0]),          # zero vector
        (3, [-0.001, 0.0005, 0.002]),  # tiny magnitudes
        (4, [127.0, -127.0, 64.0]),
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_quantize_int8_range_and_zero_vector(spark, vecs):
    out = {r["vec_id"]: r for r in vo.quantize_int8(vecs).collect()}
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r["q"])
    # absmax element maps to ±127 exactly
    assert 127 in [abs(q) for q in out[1]["q"]]
    assert out[2]["q"] == [0, 0, 0] and out[2]["absmax"] == 0.0


def test_quantize_roundtrip_error_bound(spark, vecs):
    out = vo.dequantize_int8(vo.quantize_int8(vecs)).collect()
    for r in out:
        bound = r["absmax"] / 254 + 1e-12
        for x, d in zip(r["embedding"], r["deq"]):
            assert abs(x - d) <= bound, (r["vec_id"], x, d, bound)


def test_l2_normalize_unit_norm_and_zero_null(spark, vecs):
    out = {r["vec_id"]: r["unit"] for r in vo.l2_normalize(vecs).collect()}
    for vid in (1, 3, 4):
        assert math.isclose(
            math.sqrt(sum(x * x for x in out[vid])), 1.0, rel_tol=1e-9
        )
    assert out[2] is None  # zero vector: NULL, not NaN


# ------------------------------------------------------- token budget


@pytest.fixture(scope="module")
def budget_docs(spark):
    rows = [(i, f"dom{i % 3}", 10 + (i * 7) % 50) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, dom string, n_tok long")


def test_token_budget_respected(spark, budget_docs):
    out = ds.token_budget_sample(
        budget_docs, "dom", "n_tok", "doc_id", budget=500
    ).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append(r)
    for dom, rows in by_dom.items():
        total = sum(r["n_tok"] for r in rows)
        # every admitted doc started under budget; only the last one
        # may overshoot, by less than its own size
        assert total < 500 + max(r["n_tok"] for r in rows)
        assert all(r["cum_tokens"] - r["n_tok"] < 500 for r in rows)


def test_token_budget_prefix_nested_and_deterministic(spark, budget_docs):
    small = {
        r["doc_id"]
        for r in ds.token_budget_sample(
            budget_docs, "dom", "n_tok", "doc_id", budget=300
        ).collect()
    }
    big = {
        r["doc_id"]
        for r in ds.token_budget_sample(
            budget_docs, "dom", "n_tok", "doc_id", budget=900
        ).collect()
    }
    assert small <= big  # raising the budget only adds documents
    again = {
        r["doc_id"]
        for r in ds.token_budget_sample(
            budget_docs.repartition(17), "dom", "n_tok", "doc_id", budget=300
        ).collect()
    }
    assert again == small  # partitioning-independent


def test_token_budget_validates(spark, budget_docs):
    with pytest.raises(ValueError, match="budget"):
        ds.token_budget_sample(budget_docs, "dom", "n_tok", "doc_id", budget=0)


# -------------------------------------------------------- winsorize


def test_group_winsorize_clips_and_keeps_nulls(spark):
    from pandas_rust_algos_spark.operators.grouped_transform import (
        group_winsorize,
    )

    rows = [("a", i, float(i)) for i in range(1, 21)]
    rows += [("a", 99, None), ("b", 1, 5.0), ("b", 2, 5.0)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r["k"], r["i"]): r["v_wins"]
           for r in group_winsorize(df, "k", "v", lower=0.1, upper=0.9).collect()}
    import numpy as np
    vals = np.array([float(i) for i in range(1, 21)])
    lo, hi = np.percentile(vals, 10), np.percentile(vals, 90)
    assert out[("a", 1)] == pytest.approx(lo)     # below p10 -> clipped up
    assert out[("a", 20)] == pytest.approx(hi)    # above p90 -> clipped down
    assert out[("a", 10)] == 10.0                 # interior untouched
    assert out[("a", 99)] is None                 # NULL stays NULL
    assert out[("b", 1)] == 5.0                   # degenerate group: identity


def test_group_winsorize_validates(spark):
    from pandas_rust_algos_spark.operators.grouped_transform import (
        group_winsorize,
    )

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="lower"):
        group_winsorize(df, "k", "v", lower=0.9, upper=0.1)


# -------------------------------------------------------- profiling


def test_profile_table_stats(spark):
    from pandas_rust_algos_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_num"] == 1.0 and out["k"]["max_num"] == 2.0
    assert out["k"]["min_str"] is None
    assert out["s"]["n_nulls"] == 1 and out["s"]["min_str"] == "a"
    assert out["s"]["min_num"] is None
    assert out["v"]["n_nulls"] == 1 and out["v"]["max_num"] == 3.5


def test_profile_table_approx_and_validation(spark):
    from pandas_rust_algos_spark.operators.profile import profile_table

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = {r["col_name"]: r for r in profile_table(df, exact=False).collect()}
    assert abs(out["k"]["n_distinct"] - 1000) < 100  # HLL++ ballpark
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])
