"""Distributed BPE merge training — learn byte-pair-encoding merge
rules over a corpus (the training step of a GPT-2-style tokenizer;
driver-brief text-analysis extension, SURVEY §2.3 — the reference has
no text surface).

Algorithm (Sennrich et al. 2016, public): pre-tokenize to words, count
word frequencies once, then repeatedly (1) count adjacent symbol pairs
across the weighted vocabulary, (2) pick the most frequent pair, and
(3) merge its occurrences leftmost-non-overlapping in every word.

Scale shape (100 TB): the corpus is touched ONCE (the word-frequency
aggregation — one shuffle, map-side combined). Every merge step then
runs over the VOCABULARY (words × weights), which is orders of
magnitude smaller; per step: one vocab-sized pair aggregation + a
1-row TakeOrdered for the winning pair, joined back as a broadcast —
ZERO driver collects. Each step's merged vocab is localCheckpoint-ed
so step k+1 doesn't recompute steps 1..k (the same lineage-truncation
pattern as the iterative graph operators).

Determinism (the gate contract): symbols are wrapped as
``\\x02 sym \\x03`` and concatenated, so a merge is a plain (non-regex)
string ``replace`` of ``\\x02a\\x03\\x02b\\x03`` with ``\\x02ab\\x03`` —
both Spark and DuckDB replace leftmost-non-overlapping occurrences,
which IS the BPE merge convention, and a pattern can only match at a
true symbol boundary (symbol text never contains the wrappers). Ties
on the pair count break (count DESC, left, right) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import tokens

__all__ = ["bpe_learn_merges", "sql_bpe_merges"]

_A = "\x02"
_B = "\x03"


def _encode(word):
    """word → ``␂c␃`` per character, concatenated."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(F.lit(_A), F.substr(word, i, F.lit(1)),
                               F.lit(_B)),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )


def _symbols(s):
    return F.split(F.expr(f"substring({s}, 2, length({s})-2)"), _B + _A)


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 3,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over ``docs``.

    Returns one row per learned rule: ``(step, merge_left,
    merge_right, pair_count)`` — the pair merged at each step and its
    weighted frequency at the time it won."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )
    cur = words.select("n", _encode(F.col("w")).alias("s"))
    rules = []
    for step in range(1, n_merges + 1):
        syms = _symbols("s")
        pairs = (
            cur.select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, F.size(syms) - 1).alias("a"),
                        F.slice(syms, 2, F.size(syms) - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("merge_left"),
                     F.col("p.b").alias("merge_right"))
            .agg(F.sum("n").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), "merge_left", "merge_right"
        ).limit(1)
        rules.append(best.select(
            F.lit(step).cast("long").alias("step"),
            "merge_left", "merge_right", "pair_count"))
        if step < n_merges:
            pat = F.concat(F.lit(_A), F.col("merge_left"), F.lit(_B),
                           F.lit(_A), F.col("merge_right"), F.lit(_B))
            rep = F.concat(F.lit(_A), F.col("merge_left"),
                           F.col("merge_right"), F.lit(_B))
            cur = (
                cur.crossJoin(F.broadcast(best))
                .select("n", F.replace(F.col("s"), pat, rep).alias("s"))
                # vocab-sized; truncate lineage so step k+1 does not
                # re-run steps 1..k once per downstream reference
                .localCheckpoint(eager=True)
            )
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


def sql_bpe_merges(
    n_merges: int = 3,
    *,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_learn_merges`: the same word counts,
    wrapped-symbol encoding, weighted pair counts, tie-break, and
    plain-replace merges, unrolled as chained CTEs."""
    ab = "chr(2)"
    eb = "chr(3)"
    parts = [f"""
    WITH w AS (
      SELECT word AS w, COUNT(*) AS n FROM (
        SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}),
               '\\s+'), x -> x <> '')) AS word
        FROM {table}
      ) GROUP BY 1
    ),
    s0 AS (
      SELECT n, {ab} || array_to_string(
        list_transform(range(1, length(w)+1),
                       i -> substr(w, CAST(i AS INTEGER), 1)),
        {eb}||{ab}) || {eb} AS s
      FROM w
    )"""]
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        parts.append(f""",
    u{k} AS (
      SELECT n, string_split(substr(s, 2, length(s)-2), {eb}||{ab}) AS syms
      FROM {prev}
    ),
    p{k} AS (
      SELECT syms[CAST(i AS INTEGER)] AS merge_left,
             syms[CAST(i AS INTEGER)+1] AS merge_right,
             CAST(SUM(n) AS BIGINT) AS pair_count
      FROM u{k}, UNNEST(range(1, len(syms))) AS z(i)
      GROUP BY 1, 2
    ),
    best{k} AS (
      SELECT * FROM p{k}
      ORDER BY pair_count DESC, merge_left, merge_right LIMIT 1
    )""")
        if k < n_merges:
            parts.append(f""",
    s{k} AS (
      SELECT n, replace(s,
        {ab}||(SELECT merge_left FROM best{k})||{eb}
          ||{ab}||(SELECT merge_right FROM best{k})||{eb},
        {ab}||(SELECT merge_left FROM best{k})
          ||(SELECT merge_right FROM best{k})||{eb}) AS s
      FROM {prev}
    )""")
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, merge_left, merge_right, "
        f"pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
