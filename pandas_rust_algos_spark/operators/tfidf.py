"""TF-IDF term scoring and inverted-index construction — corpus-level
text-analysis primitives (driver-brief extension; the reference has no
text surface, SURVEY §2.3).

Scale shape
-----------
Three shuffles, each load-bearing and none avoidable for exact
corpus-level statistics:

1. explode → ``(doc, term)`` partial-count — map-side combine runs
   before the shuffle, so the wire carries one row per distinct
   (doc, term), not one per token occurrence;
2. document frequency via a window keyed by ``term`` — reuses the
   aggregated rows, no second scan of the corpus;
3. per-document top-k via a window keyed by ``doc`` — rank over the
   scored rows, never a sort of the whole corpus.

The corpus size ``N`` joins in as a broadcast one-row aggregate —
never a driver-side ``.count()`` round-trip baked into the plan as a
stale literal.

Skew note: natural-language term frequencies are Zipfian, so the
``term``-keyed stages see heavy keys (stopwords). The aggregation
states here are O(1) per key (count, df), so skew costs time, not
memory; AQE's skew-join handling splits oversized partitions. The
inverted index's ``collect_list`` is the one O(key-frequency) state —
capped via ``max_postings`` for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.text import tokens

__all__ = ["tfidf_topk", "inverted_index"]


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    ``score = tf · ln((N+1)/(df+1))``, rounded to ``round_digits`` —
    ranking orders by the ROUNDED score (then term, for a total
    deterministic order), so engines whose ``ln`` differs in the last
    ulp still rank identically (registry determinism rule 4)."""
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # df per term as a window over the (doc, term) aggregate: one
    # shuffle by term, no separate vocab join (a vocab table at 100 TB
    # is itself too big to broadcast)
    dfreq = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = dfreq.crossJoin(F.broadcast(n)).withColumn(
        "score",
        F.round(
            F.col("tf")
            * F.ln((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
            round_digits,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_postings: int | None = None,
) -> DataFrame:
    """Posting lists: one row per term with its exact document
    frequency and the sorted, comma-joined document ids.

    One shuffle keyed by term after a map-side distinct of
    ``(doc, term)``. ``max_postings`` caps the materialized list for
    Zipf-head terms (df stays exact) — at web scale an uncapped
    stopword posting list is a single-key multi-GB aggregation state,
    which is the one thing a groupBy must never hold."""
    tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    postings = F.sort_array(F.collect_list(F.col(id_col)))
    if max_postings is not None:
        postings = F.slice(postings, 1, max_postings)
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",", F.transform(postings, lambda x: x.cast("string"))
        ).alias("postings"),
    )
