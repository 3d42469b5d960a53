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

from pandas_rust_algos_spark.operators.text import token_count, tokens

__all__ = ["tfidf_topk", "bm25_topk", "inverted_index"]


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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` documents for a bag-of-terms
    query. Per matched (doc, term):

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        part = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    and the document score is the exact fixed-point sum of its term
    parts (floor(part*1e6) as long — associative, so the cross-term
    addition order Spark picks cannot flip ranks; registry determinism
    rule 1). The corpus stats (N, total token count → avgdl) ride as a
    broadcast one-row aggregate, and df for the ≤|query| matched terms
    as a broadcast join — the only full-corpus work is the token-count
    projection (narrow) and the term filter BEFORE the explode output
    shuffles, so the scored set is |docs containing a query term|, not
    the corpus.

    Scale shape (100 TB): filter-at-the-scan on the query terms makes
    every shuffle O(matching docs); the global top-k is a TakeOrdered
    (per-partition heads + driver merge of k·partitions rows), never a
    total sort. The reference has no retrieval surface (SURVEY §2.3) —
    this is the driver-brief text-analysis extension next to
    :func:`tfidf_topk`.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    dl = docs.select(F.col(id_col), token_count(text_col).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).where(F.col("term").isin(list(query_terms)))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    part = (
        F.ln(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(part * 1e6).cast("long").alias("part_micro"),
        )
        .groupBy(id_col)
        .agg((F.sum("part_micro").cast("double") / 1e6).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def sql_bm25_score(
    terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (without the top-k cut): a
    SELECT yielding (doc_id, score) over ``table``, same expression
    tree term-for-term so the fixed-point parts match bit-exactly."""
    from pandas_rust_algos_spark.operators.text import sql_token_count

    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
    WITH dl AS (
      SELECT {id_expr} AS doc_id,
             CAST({sql_token_count(text_expr)} AS BIGINT) AS dl
      FROM {table}
    ), st AS (
      SELECT SUM(dl) AS total_tokens, COUNT(*) AS n_docs FROM dl
    ), tok AS (
      SELECT {id_expr} AS doc_id,
             UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_expr}), '\\s+'),
                    x -> x <> '')) AS term
      FROM {table}
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN ({quoted}) GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    )
    SELECT tf.doc_id,
           CAST(SUM(CAST(FLOOR(
             LN(CAST(1.0 AS DOUBLE)
                + (n_docs - df + CAST(0.5 AS DOUBLE))
                  / (df + CAST(0.5 AS DOUBLE)))
             * (tf * CAST({k1 + 1.0!r} AS DOUBLE))
             / (tf + CAST({k1!r} AS DOUBLE)
                     * (CAST({1.0 - b!r} AS DOUBLE)
                        + CAST({b!r} AS DOUBLE) * dl
                          / (CAST(total_tokens AS DOUBLE) / n_docs)))
             * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
    FROM tf JOIN dfreq USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN st
    GROUP BY tf.doc_id
    """
