"""Property-based differential tests (hypothesis): randomized grouped
series with NULL injection run through BOTH this engine and pandas, any
divergence shrunk to a minimal counterexample. This is the reference's
own seeded-recipe methodology (`/root/reference/README.md:16-140`)
upgraded from fixed seeds to searched inputs.

Example counts are kept small: each example pays a Spark createDataFrame
+ collect round trip, and the adversarial shapes (ties, all-NULL groups,
singletons) are already covered deterministically in
test_differential_pandas.py — hypothesis adds the search, not the bulk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandas_rust_algos_spark.operators import grouped_agg as ga
from pandas_rust_algos_spark.operators import grouped_transform as gt

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def grouped_series(draw):
    n = draw(st.integers(min_value=4, max_value=50))
    keys = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    # small int domain → frequent exact ties; None → NULL/NaN
    vals = draw(st.lists(st.one_of(st.none(), st.integers(-9, 9)),
                         min_size=n, max_size=n))
    return keys, vals


def _frames(spark, keys, vals):
    pdf = pd.DataFrame({
        "k": keys,
        "ord": np.arange(len(keys)),
        "v": pd.array([float(v) if v is not None else np.nan for v in vals],
                      dtype=float),
    })
    return pdf, spark.createDataFrame(pdf)


def _close(a, b):
    if a is None or (isinstance(a, float) and np.isnan(a)):
        return b is None or (isinstance(b, float) and np.isnan(b))
    return b is not None and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


@settings(**_SETTINGS)
@given(data=grouped_series())
def test_cumsum_rank_match_pandas_on_random_input(spark, data):
    keys, vals = data
    pdf, sdf = _frames(spark, keys, vals)

    out = gt.group_cumsum(sdf, "k", ["ord"], ["v"])
    got = {r["ord"]: r["v_cumsum"] for r in out.collect()}
    exp = pdf.sort_values("ord").groupby("k")["v"].cumsum()
    for i, want in exp.items():
        assert _close(got[pdf.loc[i, "ord"]], want), (keys, vals, i)

    out = gt.group_rank(sdf, "k", "v", method="average", out_col="r")
    got = {r["ord"]: r["r"] for r in out.collect()}
    exp = pdf.groupby("k")["v"].rank(method="average")
    for i, want in exp.items():
        assert _close(got[pdf.loc[i, "ord"]], want), (keys, vals, i)


@settings(**_SETTINGS)
@given(data=grouped_series(),
       q=st.floats(0.0, 1.0, allow_nan=False, exclude_min=False))
def test_quantile_matches_pandas_on_random_input(spark, data, q):
    keys, vals = data
    pdf, sdf = _frames(spark, keys, vals)
    out = ga.group_quantile(sdf, "k", "v", [q], interpolation="linear")
    got = {r["k"]: r["quantile"] for r in out.collect()}
    exp = pdf.groupby("k")["v"].quantile(q, interpolation="linear")
    for k, want in exp.items():
        assert _close(got[k], want), (keys, vals, k, q)


@settings(**_SETTINGS)
@given(
    strings=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=8),
        min_size=2, max_size=12),
    k=st.integers(min_value=0, max_value=3),
)
def test_fuzzy_join_matches_bruteforce(spark, strings, k):
    """Length-banded fuzzy join must equal the exhaustive O(n²) pair
    scan for any strings and any max_dist — the losslessness proof,
    searched."""
    from pandas_rust_algos_spark.operators.fuzzy_join import fuzzy_self_join

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_self_join(df, "id", "s", max_dist=k).collect()}
    want = {
        (ia, ib): lev(sa, sb)
        for ia, sa in rows for ib, sb in rows
        if ia < ib and lev(sa, sb) <= k
    }
    assert got == want
