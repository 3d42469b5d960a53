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

# Deliberate flakiness policy: the default run is DERANDOMIZED so the
# suite is green every session (the CI/gate bar); set HYPOTHESIS_EXPLORE=1
# for an exploratory run that searches fresh inputs each time. Edge cases
# exploration finds get promoted to deterministic regression tests (see
# test_operators.py::test_drift_report_all_null_reference for one such
# promotion from round 3).
import os as _os

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=_os.environ.get("HYPOTHESIS_EXPLORE", "") != "1",
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


# ------------------------------------------------- round-3 pipeline ops


@st.composite
def token_docs(draw, min_docs=2, max_docs=8):
    """Documents over a 4-word vocabulary — tiny domain forces shared
    n-grams, repeats, and sub-n-token docs."""
    n = draw(st.integers(min_docs, max_docs))
    return [
        " ".join(draw(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                               min_size=0, max_size=10)))
        for _ in range(n)
    ]


def _py_grams(text: str, n: int) -> list[str]:
    toks = text.split()
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@settings(**_SETTINGS)
@given(corpus=token_docs(), bench=token_docs(max_docs=4),
       n=st.integers(2, 4))
def test_decontaminate_matches_bruteforce(spark, corpus, bench, n):
    """Both probe variants (string and xxhash64) must equal the
    exhaustive Python gram-set intersection for any inputs."""
    from pandas_rust_algos_spark.operators.decontam import decontaminate

    cdf = spark.createDataFrame(list(enumerate(corpus)),
                                "doc_id long, text string")
    bdf = spark.createDataFrame(list(enumerate(bench)),
                                "doc_id long, text string")
    bench_set = {g for t in bench for g in _py_grams(t, n)}
    want = {}
    for i, t in enumerate(corpus):
        grams = set(_py_grams(t, n))
        want[i] = (len(grams), len(grams & bench_set))
    for hashed in (False, True):
        out = decontaminate(cdf, bdf, n=n, hashed=hashed).collect()
        got = {r["doc_id"]: (r["n_grams"], r["n_hits"]) for r in out}
        assert got == want, (corpus, bench, n, hashed)


@settings(**_SETTINGS)
@given(docs=token_docs())
def test_repetition_signals_match_bruteforce(spark, docs):
    from collections import Counter

    from pandas_rust_algos_spark.operators.text import repetition_signals

    sdf = spark.createDataFrame(list(enumerate(docs)),
                                "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(sdf, n=2).collect()}
    for i, t in enumerate(docs):
        grams = _py_grams(t, 2)
        r = got[i]
        assert r["n_tokens"] == len(t.split())
        assert r["n_ngrams"] == len(grams)
        assert r["n_distinct"] == len(set(grams))
        if grams:
            assert _close(r["dup_ngram_frac"],
                          (len(grams) - len(set(grams))) / len(grams))
            assert _close(r["top_ngram_frac"],
                          Counter(grams).most_common(1)[0][1] / len(grams))
        else:
            assert r["dup_ngram_frac"] is None


@settings(**_SETTINGS)
@given(
    rows=st.lists(st.tuples(st.integers(0, 10_000),
                            st.sampled_from(["x", "y", "z"])),
                  min_size=3, max_size=40, unique_by=lambda r: r[0]),
    wx=st.integers(1, 5), wy=st.integers(0, 5), wz=st.integers(0, 5),
)
def test_domain_mix_matches_bruteforce(spark, rows, wx, wy, wz):
    """Spark's in-plan threshold arithmetic must reproduce the Python
    reference bit-exactly — the same reproducibility contract the
    DuckDB oracle relies on."""
    import hashlib
    import math

    from pandas_rust_algos_spark.operators.datasplit import domain_mix_sample

    weights = {d: w for d, w in (("x", wx), ("y", wy), ("z", wz)) if w > 0}
    sdf = spark.createDataFrame(rows, "id long, domain string")
    kept = sorted(r["id"] for r in
                  domain_mix_sample(sdf, "domain", "id", weights,
                                    salt="prop").collect())

    total_w = sum(weights.values())
    wn = {d: w / total_w for d, w in weights.items()}
    counts = {}
    for _id, d in rows:
        counts[d] = counts.get(d, 0) + 1
    present = {d: c for d, c in counts.items() if d in wn}
    if not present:
        # No weighted domain appears in the data: the operator's inner
        # join on weights correctly yields an empty result.
        assert kept == []
        return
    t = min(float(c) / wn[d] for d, c in present.items())
    want = []
    for _id, d in rows:
        if d not in present:
            continue
        frac = min(1.0, (wn[d] * t) / float(present[d]))
        ti = int(math.floor(frac * 16 ** 6))
        thr = "g" if ti >= 16 ** 6 else format(ti, "06x")
        if hashlib.md5(f"{_id}:prop".encode()).hexdigest() < thr:
            want.append(_id)
    assert kept == sorted(want), (rows, weights)


# ------------------------------------------------- round-3b operators


@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 5)),
        min_size=1, max_size=60,
    ),
    min_pairs=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_basket_pairs_match_bruteforce(spark, baskets, min_pairs):
    """Array-algebra pair generation must equal the brute-force
    all-pairs enumeration (co-counts, item counts, and lift)."""
    from collections import Counter
    from itertools import combinations

    from pandas_rust_algos_spark.operators.frequency import basket_pairs

    df = spark.createDataFrame(baskets, "b long, i long")
    got = {
        (r["pa"], r["pb"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift"])
        for r in basket_pairs(df, "b", "i", min_pairs=min_pairs).collect()
    }

    items = sorted(set(baskets))
    per_basket: dict[int, set[int]] = {}
    for b, i in items:
        per_basket.setdefault(b, set()).add(i)
    n_baskets = len(per_basket)
    item_c = Counter(i for s in per_basket.values() for i in s)
    pair_c = Counter()
    for s in per_basket.values():
        for a, b in combinations(sorted(s), 2):
            pair_c[(a, b)] += 1
    want = {
        p: (c, item_c[p[0]], item_c[p[1]],
            (c * n_baskets) / (item_c[p[0]] * item_c[p[1]]))
        for p, c in pair_c.items() if c >= min_pairs
    }
    assert got == want


@given(
    ref=st.lists(st.one_of(st.none(), st.floats(-50, 50)),
                 min_size=1, max_size=40),
    cur=st.lists(st.one_of(st.none(), st.floats(-80, 80)),
                 min_size=0, max_size=40),
    nb=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_drift_report_matches_bruteforce(spark, ref, cur, nb):
    from pandas_rust_algos_spark.operators.drift import drift_report

    rdf = spark.createDataFrame([(v,) for v in ref], "x double")
    cdf = spark.createDataFrame([(v,) for v in cur], "x double") \
        if cur else spark.createDataFrame([], "x double")
    got = {r["bucket"]: (r["n_ref"], r["n_cur"])
           for r in drift_report(rdf, cdf, "x", n_buckets=nb).collect()}

    rv = [v for v in ref if v is not None]
    cv = [v for v in cur if v is not None]
    want = {b: [0, 0] for b in range(nb)}
    if rv:
        lo, hi = min(rv), max(rv)
        width = (hi - lo) / float(nb)

        def bucket(x):
            if hi == lo:
                return 0
            return max(0, min(nb - 1, int(np.floor((x - lo) / width))))

        for v in rv:
            want[bucket(v)][0] += 1
        for v in cv:
            want[bucket(v)][1] += 1
    assert got == {b: tuple(v) for b, v in want.items()}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.one_of(st.none(),
                                               st.integers(-9, 9))),
        min_size=1, max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_expectations_match_bruteforce(spark, rows):
    from pandas_rust_algos_spark.operators import validate as V

    df = spark.createDataFrame(rows, "g long, x long")
    rep = {(r["rule"], r["target"]): r["violations"]
           for r in V.expectations_report(
               df,
               rules=[V.not_null("x"), V.in_range("x", -3, 3)],
               uniques=[V.unique("g", "x")],
           ).collect()}
    xs = [x for _, x in rows]
    assert rep[("not_null", "x")] == sum(1 for x in xs if x is None)
    assert rep[("in_range[-3,3]", "x")] == \
        sum(1 for x in xs if x is not None and not -3 <= x <= 3)
    assert rep[("unique", "g,x")] == len(rows) - len(set(rows))


@st.composite
def weighted_series(draw):
    n = draw(st.integers(min_value=3, max_value=40))
    keys = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    vals = draw(st.lists(st.one_of(st.none(), st.integers(-9, 9)),
                         min_size=n, max_size=n))
    # weights in micro-unit-exact steps of 0.25 so the 1e-6 fixed-point
    # quantization is lossless and numpy can be the exact reference
    wts = draw(st.lists(
        st.one_of(st.none(),
                  st.integers(0, 12).map(lambda i: i * 0.25)),
        min_size=n, max_size=n))
    return keys, vals, wts


@settings(**_SETTINGS)
@given(data=weighted_series())
def test_weighted_stats_match_numpy_on_random_input(spark, data):
    """Weighted mean/var/median vs a direct numpy replay of the
    documented formulas (frequency weights, NA-skip on value OR
    weight, left-continuous weighted quantile)."""
    from pandas_rust_algos_spark.operators import weighted as wt

    keys, vals, wts = data
    rows = [(str(k), float(v) if v is not None else None,
             w) for k, v, w in zip(keys, vals, wts)]
    sdf = spark.createDataFrame(rows, "k string, x double, w double")

    obs: dict[str, list[tuple[float, float]]] = {}
    for k, v, w in zip(keys, vals, wts):
        if v is None or w is None:
            continue
        obs.setdefault(str(k), []).append((float(v), float(w)))

    got = {r["k"]: (r["wmean"], r["wvar"]) for r in
           wt.group_weighted_stats(sdf, "k", "x", "w").collect()}
    gq = {r["k"]: r["wquantile"] for r in wt.group_weighted_quantile(
        sdf, "k", "x", "w", q=0.5).collect()}

    for k, pairs in obs.items():
        sw = sum(w for _, w in pairs)
        swx = sum(w * x for x, w in pairs)
        swxx = sum(w * x * x for x, w in pairs)
        wmean = swx / sw if sw > 0 else None
        wvar = ((swxx - swx * swx / sw) / (sw - 1.0)
                if sw - 1.0 > 0 else None)
        g_mean, g_var = got[k]
        assert _close(g_mean, wmean), (k, rows)
        assert _close(g_var, wvar), (k, rows)
        # weighted median: min x with cumw >= 0.5*W over value order
        if sw > 0:
            want = None
            cum = 0.0
            for x, w in sorted(pairs):
                cum += w
                if cum >= 0.5 * sw:
                    want = x
                    break
            assert gq[k] == want, (k, rows)
        else:
            assert k not in gq  # zero total weight -> no crossing row
    assert set(got) == set(obs)
