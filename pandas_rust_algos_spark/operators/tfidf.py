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

from pandas_rust_algos_spark import cachelife
from pandas_rust_algos_spark.operators.text import token_count, tokens

__all__ = ["tfidf_topk", "bm25_topk", "bm25_batch_topk",
           "sql_bm25_batch_topk", "inverted_index",
           "hashing_vectorize", "sql_hashing_vectorize"]


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
    aggregates from the PERSISTED tf rows and broadcasts back — the
    only full-corpus work is
    the stats projection (narrow) and the term filter BEFORE the
    explode output shuffles, so the scored set is |docs containing a
    query term|, not the corpus. The document length rides THROUGH the
    explode and the tf aggregation (a per-doc constant, folded with
    ``max``) instead of joining back a corpus-sized length table —
    that join was a sort-merge whose build side was every document in
    the corpus, for a probe side of only the matching docs; the token
    array materializes once in its own projection so size + explode
    share one tokenizer run (CollapseProject keeps a non-cheap alias
    referenced twice in its own project).

    Scale shape (100 TB): filter-at-the-scan on the query terms makes
    every shuffle O(matching docs); the global top-k is a TakeOrdered
    (per-partition heads + driver merge of k·partitions rows), never a
    total sort. The reference has no retrieval surface (SURVEY §2.3) —
    this is the driver-brief text-analysis extension next to
    :func:`tfidf_topk`.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    stats = docs.select(token_count(text_col).alias("dl")).agg(
        F.sum("dl").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tok = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .where(F.col("term").isin(list(query_terms)))
    )
    # tf persists because it feeds BOTH df and the scoring pass — the
    # lazy form re-derived the whole corpus explode as the df build
    # side. It is matched-rows-sized (|docs containing a query term| ×
    # terms), never the corpus. A count window over term was tried
    # instead and rejected: ≤|query| distinct partition keys collapse
    # the sort onto a handful of tasks (guide §2.5 synthetic-key skew).
    # Tracked for deferred release: the cache is referenced by the
    # RETURNED plan, so the materializing caller unpersists it.
    tf = cachelife.track(tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")).persist())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    part = (
        F.ln(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
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


def hashing_vectorize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 64,
    signed: bool = True,
    hash_mode: str = "portable",
) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al.
    ICML'09, public): fixed-``dim`` term-count vectors with NO
    vocabulary pass — each term maps to ``hash(term) % dim``, and the
    signed variant flips the contribution by a second hash bit so
    collision noise is zero-mean (the property that lets linear models
    train on hashed features). The standard cheap featurizer for
    dedup-adjacent clustering, quality classifiers, and domain taggers
    over a 100 TB corpus where a vocabulary build is a whole extra
    job. Returns ``(id, vec)`` with ``vec`` an ``array<long>`` of
    length ``dim``.

    Scale shape: explode to tokens, partial-count into (id, bucket)
    cells — map-side combine bounds the wire at ``dim`` rows per doc
    per task — then one doc-keyed assembly into a map and a
    higher-order densification (no dim-sized grid join, no Python).
    ``portable`` hash mode (md5-prefix) is SQL-replayable; ``fast``
    (xxhash64) is the scale default."""
    from pandas_rust_algos_spark.operators.frequency import _cms_hash

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    bucket = F.pmod(_cms_hash(0, F.col("tok"), hash_mode), F.lit(dim))
    sgn = (
        F.when(F.pmod(_cms_hash(1, F.col("tok"), hash_mode),
                      F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
        if signed else F.lit(1)
    )
    cells = (
        toks.select(F.col(id_col), bucket.cast("int").alias("b"),
                    sgn.cast("long").alias("s"))
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("b"), F.col("v"))))
    assembled = cells.groupBy(id_col).agg(m.alias("__m"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")),
            F.lit(0).cast("long")),
    )
    # left join keeps empty/whitespace-only docs as all-zero vectors
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return (
        df.select(id_col).join(assembled, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__m").isNull(), zero).otherwise(vec)
            .alias("vec"),
        )
    )


def sql_hashing_vectorize(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 64,
    signed: bool = True,
) -> str:
    """DuckDB twin of :func:`hashing_vectorize` (portable mode): same
    tokenizer, same md5-prefix bucket/sign hashes, same signed sums,
    vector serialized as a comma-joined string (list columns do not
    hash-compare across engines; the string pins every element and
    its order)."""
    from pandas_rust_algos_spark.operators.frequency import sql_cms_hash

    toks = (f"LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_col}), '\\s+'), "
            "x -> x <> '')")
    h0 = sql_cms_hash(0, "tok")
    h1 = sql_cms_hash(1, "tok")
    sgn = (f"CASE WHEN ({h1}) % 2 = 0 THEN 1 ELSE -1 END"
           if signed else "1")
    return f"""
    WITH tok AS (
      SELECT {id_col}, UNNEST({toks}) AS tok FROM {table}
    ), cells AS (
      SELECT {id_col}, ({h0}) % {dim} AS b,
             SUM({sgn}) AS v
      FROM tok GROUP BY 1, 2
    ), grid AS (
      SELECT t.{id_col}, g.i AS b
      FROM (SELECT DISTINCT {id_col} FROM {table}) t,
           UNNEST(RANGE(0, {dim})) AS g(i)
    ), dense AS (
      SELECT grid.{id_col}, grid.b,
             COALESCE(cells.v, 0) AS v
      FROM grid LEFT JOIN cells
        ON grid.{id_col} = cells.{id_col} AND grid.b = cells.b
    )
    SELECT {id_col},
           ARRAY_TO_STRING(LIST(CAST(v AS VARCHAR) ORDER BY b), ',')
             AS vec_csv
    FROM dense GROUP BY 1
    """


def bm25_batch_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """:func:`bm25_topk` for a *query table* — the production retrieval
    shape: thousands of queries scored against the corpus in ONE pass,
    not one job per query. ``queries`` carries ``(query_id, term)``
    rows (duplicate terms within a query are collapsed — BM25 is a
    bag-of-TERMS model here, matching the single-query operator).

    Plan: the corpus-side work (doc lengths, token explode, tf) is
    computed once for the UNION of all query terms — the term filter
    is a broadcast semi-join against the distinct-term set instead of
    the single-query ``isin`` literal, so a 10k-query batch costs the
    same corpus scans as one query. df per matched term is corpus-wide
    (identical to the single-query semantics). Per-(query, doc) scores
    sum the matched term parts in exact fixed point; the per-query
    top-k is one window over the scored set — rows = Σ_q |docs
    matching q|, never corpus × queries. As in :func:`bm25_topk`, the
    document length rides through the explode and the tf aggregation
    instead of joining back a corpus-sized length table.

    Output: ``(query_id, doc_id, score, rank)`` with ranks 1..k per
    query by (score DESC, doc_id).
    """
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(term_col).alias("term")
    ).distinct()
    qterms = q.select("term").distinct()

    stats = docs.select(token_count(text_col).alias("dl")).agg(
        F.sum("dl").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tok = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .join(F.broadcast(qterms), "term", "left_semi")
    )
    # persisted for the same df/scoring dual use as bm25_topk,
    # tracked for the same deferred release
    tf = cachelife.track(tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")).persist())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    part = (
        F.ln(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(q), "term")          # fan out to queries
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("qid").alias(query_id_col),
            F.col(id_col),
            F.floor(part * 1e6).cast("long").alias("part_micro"),
        )
        .groupBy(query_id_col, id_col)
        .agg((F.sum("part_micro").cast("double") / 1e6).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def sql_bm25_batch_topk(
    queries: dict[object, list[str]],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    table: str = "documents",
    qid_sql_type: str = "BIGINT",
) -> str:
    """DuckDB twin of :func:`bm25_batch_topk` for a literal query set —
    same df/avgdl statistics, same fixed-point term-part sum, same
    per-query (score DESC, doc_id) rank."""
    from pandas_rust_algos_spark.operators.text import sql_token_count

    if not queries:
        raise ValueError("queries must be non-empty")

    def _qid_lit(qid: object) -> str:
        # string qids escape like terms ('' doubling) — repr() of a
        # string containing a quote emits double quotes, which SQL
        # reads as an identifier, not a literal
        if isinstance(qid, str):
            return "'" + qid.replace("'", "''") + "'"
        return repr(qid)

    vals = ", ".join(
        f"(CAST({_qid_lit(qid)} AS {qid_sql_type}), '"
        + t.replace("'", "''") + "')"
        for qid, terms in queries.items() for t in sorted(set(terms))
    )
    return f"""
    WITH q(qid, term) AS (VALUES {vals}),
    dl AS (
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
      WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT q.qid AS query_id, tf.doc_id,
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
              JOIN q ON q.term = tf.term
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN st
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id)
                AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """
