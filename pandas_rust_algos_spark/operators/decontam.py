"""Benchmark decontamination — flag training documents that share
token n-grams with an evaluation/benchmark set.

The standard published recipe (GPT-3 appx. C / PaLM / Llama data
cards): build the set of length-N token n-grams over the benchmark
corpus, then mark any training document containing one. The reference
repo has no text surface (SURVEY §2.3); this is driver-brief
training-data-pipeline surface.

Scale shape (the part that matters at 100 TB):

- The benchmark side is eval sets — thousands of documents, millions
  of grams at most. Its distinct gram set **broadcasts**; the corpus
  side never shuffles for the probe.
- The corpus side explodes to *distinct* grams per document
  (``array_distinct`` before explode bounds the blow-up at unique
  grams, and repeated grams can't double-count hits), inner-joins the
  broadcast gram set, and aggregates hit counts back per document with
  map-side partial aggregation — one narrow pass over the corpus plus
  one small shuffle of (doc_id, hits).
- ``hashed=True`` probes on ``xxhash64(gram)`` instead of the gram
  string: 8-byte probe keys instead of ~50-byte strings (the broadcast
  table and the join both shrink ~6×). A 64-bit collision marks a
  clean document contaminated with p ≈ n_bench_grams·2⁻⁶⁴ — harmless
  for a filter that errs toward dropping; the default stays unhashed
  because that form is engine-portable (the DuckDB oracle runs the
  same logic verbatim — gate ``decontaminate``).

Both the Spark expression and the oracle SQL derive from the same
token/gram spec as :mod:`operators.text` (whitespace tokens,
empty-normalized), so the gate's hash compare proves the gram algebra,
not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import (
    sql_token_ngrams as _sql_grams,
    token_ngrams as _grams,
)

__all__ = ["token_ngrams", "decontaminate", "sql_token_ngrams"]


def token_ngrams(col: Column | str, n: int) -> Column:
    """DISTINCT space-joined token ``n``-grams (set semantics — dedup/
    decontam care about presence, not multiplicity). Shares the gram
    spec with :func:`operators.text.token_ngrams`."""
    return F.array_distinct(_grams(col, n))


def sql_token_ngrams(expr: str, n: int) -> str:
    """DuckDB twin of :func:`token_ngrams`."""
    return f"LIST_DISTINCT({_sql_grams(expr, n)})"


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per-corpus-document contamination report against ``benchmark``:
    ``(id_col, n_grams, n_hits, contaminated)`` where ``n_hits`` counts
    the document's distinct ``n``-grams that appear anywhere in the
    benchmark and ``contaminated = n_hits >= min_hits``.

    Filter usage: ``report.where(~F.col('contaminated'))`` joined back
    (or semi-joined) selects the clean corpus. The report form is kept
    (rather than returning the filtered corpus) so pipelines can audit
    contamination rates per source/language before dropping data.
    """
    grams = token_ngrams(text_col, n)
    # null-safe: a gramless doc's NULL placeholder (explode_outer) must
    # not hash to a probe-able constant
    probe = (
        F.when(F.col("gram").isNotNull(), F.xxhash64(F.col("gram")))
        if hashed else F.col("gram")
    )

    bench_grams = (
        benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .select(probe.alias("bg"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode_outer(grams).alias("gram")
    ).select(id_col, F.col("gram"), probe.alias("pg"))

    hits = (
        doc_grams.join(
            F.broadcast(bench_grams), F.col("pg") == F.col("bg"), "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("bg").alias("n_hits"),
        )
    )
    return hits.select(
        id_col,
        "n_grams",
        "n_hits",
        (F.col("n_hits") >= min_hits).alias("contaminated"),
    )
