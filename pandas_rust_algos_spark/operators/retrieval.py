"""Hybrid retrieval primitives: reciprocal-rank fusion (RRF) and
maximal-marginal-relevance (MMR) diversification.

Driver-brief extensions — the reference has no retrieval surface
(SURVEY §2.3); these compose the engine's existing ranked-retrieval
operators (``tfidf.bm25_topk``, ``similarity.cosine_topk``) into the
two post-processing steps every modern RAG / training-data retrieval
stack runs after the first-stage rankers:

* **RRF** (Cormack, Clarke & Buettcher, SIGIR'09): fuse N ranked lists
  by ``score(d) = Σ_i 1/(k0 + rank_i(d))`` — rank-based, so a BM25
  score scale never has to be calibrated against a cosine scale.
* **MMR** (Carbonell & Goldstein, SIGIR'98): greedily re-rank a
  relevance shortlist trading relevance against redundancy:
  ``argmax_i λ·rel(i) − (1−λ)·max_{j∈S} sim(i,j)``.

Scale shape (100 TB)
--------------------
Both operators are *post-first-stage*: their inputs are top-k lists
(tens to hundreds of rows), not the corpus. The corpus-scale work
happens inside the first-stage rankers, which keep their own audited
plans (BM25: filter-at-scan + TakeOrdered; cosine: broadcast queries +
per-query window top-k). RRF is a full-outer join of k-row lists —
metadata-sized by construction, broadcast both sides. MMR's greedy
loop is inherently sequential in the selection count and runs
driver-side over the collected shortlist (k·dim floats — the same
metadata-size class as the kmeans centroid collect); the distributed
part is the shortlist itself and its pairwise similarity matrix.

Determinism
-----------
RRF: ranks are integers and ``1.0/(k0+rank)`` is one IEEE division;
the fused score sums the per-list terms in declared list order, so
Spark and the SQL oracle evaluate the identical expression tree
(registry determinism rule 2). MMR: candidate relevances and pairwise
similarities are the engine's round-6 cosine (rule 4); the greedy
arithmetic on those rounded doubles (one multiply by λ, one by 1−λ,
one subtract, one max) is IEEE-deterministic, ties broken by id — the
DuckDB twin replays the loop as an unrolled CTE chain and lands on
bit-identical selections and scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_rust_algos_spark.operators.similarity import cosine, cosine_topk

__all__ = ["rrf_fuse_topk", "mmr_diversify", "sql_mmr_diversify"]


def rrf_fuse_topk(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Fuse N ranked lists by reciprocal-rank fusion; return the top
    ``k`` fused rows as ``(id_col, rrf_score, rank_1..rank_N, rank)``.

    Each input carries ``(id_col, rank_col)`` with ranks 1-based and
    unique per list (the shape every ``*_topk`` operator here emits).
    A document missing from a list contributes 0 for that list —
    the standard RRF convention. ``k0`` damps the head (60 in the
    original paper; rarely worth tuning).

    The join is a chain of full-outer joins on ``id_col`` over k-row
    inputs — the whole fusion is metadata-sized regardless of corpus
    size, so no broadcast hint is needed (AQE broadcasts trivially
    small sides on its own; at these row counts even a shuffle would
    be invisible).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    sides = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias(f"rank_{i + 1}"),
        )
        for i, r in enumerate(rankings)
    ]
    fused = sides[0]
    for s in sides[1:]:
        fused = fused.join(s, id_col, "full_outer")
    # Σ-term order is the declared list order: coalesce(1/(k0+r_i), 0)
    # added left-to-right, the identical tree the SQL twin writes.
    score = None
    for i in range(len(sides)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{i + 1}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    fused = fused.withColumn("rrf_score", score)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def sql_rrf_term(rank_expr: str, k0: int = 60) -> str:
    """DuckDB twin of one RRF term (NULL rank → 0)."""
    return (f"COALESCE(CAST(1.0 AS DOUBLE) / "
            f"(CAST({float(k0)!r} AS DOUBLE) + {rank_expr}), "
            f"CAST(0.0 AS DOUBLE))")


def _mmr_greedy(
    rel: dict[int, float], pw: dict[tuple[int, int], float],
    k: int, lam: float,
) -> list[tuple[int, int, float, float]]:
    """The greedy MMR loop over ROUNDED similarities. Pure-Python
    floats so every multiply/subtract/compare is the same IEEE-double
    op the SQL twin's unrolled CTEs perform. Returns
    ``(sel_rank, id, rel, mmr)`` tuples. Ties: higher mmr wins, then
    smaller id."""
    selected: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    remaining = dict(rel)
    for step in range(1, min(k, len(rel)) + 1):
        best_id, best_mmr = None, None
        for cid, r in remaining.items():
            pen = 0.0
            if chosen:
                pen = max(pw[(cid, j)] for j in chosen)
            mmr = lam * r - (1.0 - lam) * pen
            if (best_id is None or mmr > best_mmr
                    or (mmr == best_mmr and cid < best_id)):
                best_id, best_mmr = cid, mmr
        selected.append((step, best_id, remaining.pop(best_id), best_mmr))
        chosen.append(best_id)
    return selected


def mmr_diversify(
    emb: DataFrame,
    query_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist_k: int = 25,
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """MMR-diversified top-``k`` for one query vector (the row of
    ``emb`` whose ``id_col`` equals ``query_id``): first-stage exact
    cosine shortlist of ``shortlist_k``, then the greedy
    relevance-vs-redundancy re-rank at trade-off ``lam``.

    Output: ``(sel_rank, id_col, rel, mmr)`` — selection order, the
    candidate's round-6 relevance to the query, and its MMR score at
    selection time (the first pick carries ``lam·rel``: the max over
    an empty selected set is 0).

    Architecture: the corpus-scale work (shortlist top-k) and the
    shortlist's pairwise cosine matrix run distributed with the
    engine's standard round-6 + id-tie-break recipe; the greedy loop —
    sequential by definition, O(k·shortlist) comparisons over rounded
    doubles — runs driver-side on the collected shortlist
    (``shortlist_k`` rels + ``shortlist_k²`` sims: metadata-sized, the
    same class as the kmeans centroid collect). At 100 TB nothing
    changes: shortlists are shortlists.

    **Construction is EAGER** (the r8-ADVICE lesson, documented up
    front): the greedy selection needs the similarity values, so
    building the result runs the shortlist + pairwise jobs immediately
    and the returned DataFrame is a k-row literal — explain-only
    callers should stop at :func:`~pandas_rust_algos_spark.operators.
    similarity.cosine_topk`, the lazy first stage.
    """
    queries = emb.where(F.col(id_col) == query_id).select(
        F.col(id_col).alias("query_id"), vec_col
    )
    short = cosine_topk(
        emb, queries, id_col=id_col, vec_col=vec_col, k=shortlist_k
    ).select(F.col(id_col), F.col("sim").alias("rel"))
    rel_rows = short.collect()
    rel = {r[id_col]: r["rel"] for r in rel_rows}
    ids = sorted(rel)

    base = emb.where(F.col(id_col).isin(ids)).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = base.select(F.col(id_col).alias("ia"), F.col("v").alias("va"))
    b = base.select(F.col(id_col).alias("ib"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia", "ib",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
    ).collect()
    pw: dict[tuple[int, int], float] = {}
    for r in pairs:
        pw[(r["ia"], r["ib"])] = r["sim"]
        pw[(r["ib"], r["ia"])] = r["sim"]

    picked = _mmr_greedy(rel, pw, k, lam)
    # id field type follows the input frame (string/int doc ids both
    # work — the greedy loop itself is id-type-agnostic)
    out_schema = T.StructType([
        T.StructField("sel_rank", T.LongType(), False),
        T.StructField(id_col, emb.schema[id_col].dataType, True),
        T.StructField("rel", T.DoubleType(), True),
        T.StructField("mmr", T.DoubleType(), True),
    ])
    return emb.sparkSession.createDataFrame(picked, out_schema)


def sql_mmr_diversify(
    query_id: int,
    *,
    shortlist_k: int = 25,
    k: int = 10,
    lam: float = 0.7,
    table: str = "embeddings",
    id_expr: str = "vec_id",
    vec_expr: str = "embedding",
) -> str:
    """DuckDB twin of :func:`mmr_diversify`: the shortlist and pairwise
    cosines via LIST_DOT_PRODUCT at round-6, then the greedy loop
    unrolled as one CTE chain per selection step — same λ arithmetic on
    the same rounded doubles, same (mmr DESC, id) tie rule, so the
    selections and scores hash-match bit-exactly.

    Every CTE is ``AS MATERIALIZED``: ``sel{t}`` references
    ``sel{t-1}`` twice (the NOT IN probe and its own UNION), so plain
    inlining re-instantiates the chain 2^k times — at k=10 that is a
    thousand-fold re-scan of the base table (observed as a
    file-handle explosion, not just slowness)."""
    lam_s = f"CAST({lam!r} AS DOUBLE)"
    one_minus = f"CAST({1.0 - lam!r} AS DOUBLE)"
    head = f"""
    WITH q AS MATERIALIZED (
      SELECT {vec_expr}::DOUBLE[] AS qv FROM {table}
      WHERE {id_expr} = {query_id}
    ), c AS MATERIALIZED (
      SELECT {id_expr} AS id, {vec_expr}::DOUBLE[] AS v FROM {table}
    ), scored AS MATERIALIZED (
      SELECT id,
             ROUND(LIST_DOT_PRODUCT(qv, v) /
                   (SQRT(LIST_DOT_PRODUCT(qv, qv))
                    * SQRT(LIST_DOT_PRODUCT(v, v))), 6) AS rel
      FROM c, q WHERE id <> {query_id}
    ), shortlist AS MATERIALIZED (
      SELECT id, rel FROM scored ORDER BY rel DESC, id LIMIT {shortlist_k}
    ), pw AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib,
             ROUND(LIST_DOT_PRODUCT(va.v, vb.v) /
                   (SQRT(LIST_DOT_PRODUCT(va.v, va.v))
                    * SQRT(LIST_DOT_PRODUCT(vb.v, vb.v))), 6) AS sim
      FROM shortlist a JOIN shortlist b ON a.id <> b.id
      JOIN c va ON va.id = a.id JOIN c vb ON vb.id = b.id
    ), s1 AS MATERIALIZED (
      SELECT id, rel, {lam_s} * rel AS mmr
      FROM shortlist ORDER BY {lam_s} * rel DESC, id LIMIT 1
    ), sel1 AS MATERIALIZED (SELECT id FROM s1)"""
    steps = [head]
    for t in range(2, k + 1):
        steps.append(f""", cand{t} AS MATERIALIZED (
      SELECT r.id, r.rel,
             {lam_s} * r.rel - {one_minus} * (
               SELECT MAX(pw.sim) FROM pw
               WHERE pw.ia = r.id AND pw.ib IN (SELECT id FROM sel{t - 1})
             ) AS mmr
      FROM shortlist r
      WHERE r.id NOT IN (SELECT id FROM sel{t - 1})
    ), s{t} AS MATERIALIZED (
      SELECT id, rel, mmr FROM cand{t} ORDER BY mmr DESC, id LIMIT 1
    ), sel{t} AS MATERIALIZED (
      SELECT id FROM sel{t - 1} UNION ALL SELECT id FROM s{t}
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS sel_rank, id AS {id_expr}, rel, mmr "
        f"FROM s{t}" for t in range(1, k + 1)
    )
    return "".join(steps) + "\n    " + finals
