"""DSIR-style data selection by importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling",
public): score every raw-corpus document by how much more likely its
hashed-n-gram profile is under a TARGET distribution than under the
raw distribution — the standard cheap proxy for "select pretraining
data that looks like the domain we care about".

Construction:

- both corpora reduce to **hashed n-gram bucket counts** (the paper's
  hashed bag-of-n-grams model): every whitespace token n-gram hashes
  into ``buckets`` slots with the engine's shared md5-prefix 60-bit
  recipe (``frequency.hash60`` portable mode — the same hash every
  oracle replays), so each side's model is ≤ ``buckets`` rows no
  matter the corpus size;
- each side fits an add-1-smoothed unigram distribution over the
  buckets: ``p_b = (c_b + 1) / (N + buckets)``;
- a raw document's log importance weight is
  ``Σ_b c_db · (ln p_b − ln q_b)`` over its own bucket counts — the
  log likelihood ratio of its profile under target vs raw.

Determinism (the gate contract): each per-(doc, bucket) term is
floored to integer PICO-units (1e-12) and summed exactly — the
``token_kl_divergence`` recipe — so the weight is partitioning- AND
engine-independent; the final divide + round-6 absorbs the flooring.
The per-bucket log-ratio ``ln p_b − ln q_b`` is computed ONCE on the
DRIVER in CPython (the models are ≤ ``buckets`` rows — they collect
anyway) and injected as a broadcast column, so the Spark side
evaluates NO ``Math.log`` at all: JVM ``log`` is only specified to
1 ulp (semi-monotonic), while CPython and DuckDB both call the host
libm's correctly-behaving ``log`` on identical double arguments —
removing the cross-engine ulp class the r7 ADVICE flagged (a 1-ulp
log difference amplified by the pico floor could flip the hash when
a term landed on a grid boundary). Divide/multiply/floor on both
sides are exactly-rounded IEEE ops over identical bits.

Selection itself is deliberately NOT in this op: the weight column
composes with the engine's existing deterministic samplers
(``stratified_top_n`` for top-k per stratum, ``token_budget_sample``
for budgeted selection, Gumbel-style salted-hash resampling via
``stratified_sample``) — keeping this op a pure per-document score.

Scale shape: each corpus is scanned once (explode → map-side-combined
bucket counts, traffic ≤ buckets rows per task); both models and
their totals come back as BROADCASTS (≤ buckets rows); the per-doc
aggregation is one (doc, bucket) count plus one doc-keyed sum — both
map-side combined. No driver state beyond the broadcast models.

Reference scope: no text surface exists in the reference (SURVEY
§2.3) — driver-brief training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.frequency import hash60
from pandas_rust_algos_spark.operators.text import token_ngrams

__all__ = ["dsir_log_weights", "sql_dsir_log_weights"]


def _bucket(gram_col, buckets: int):
    return F.pmod(hash60(gram_col, "portable"), F.lit(buckets)) \
        .cast("long")


def _model(df: DataFrame, text_col: str, n: int,
           buckets: int) -> DataFrame:
    """``(b, c)`` hashed-bucket counts of one corpus — ≤ buckets rows."""
    return (
        df.select(F.explode(token_ngrams(text_col, n)).alias("g"))
        .select(_bucket(F.col("g"), buckets).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1024,
) -> DataFrame:
    """``(id, n_grams, log_weight)`` for every raw document (documents
    with no n-grams — short or NULL text — score 0 with n_grams 0).
    ``log_weight > 0`` means the document looks more target-like than
    raw-average; rank on it with the engine's deterministic
    samplers."""
    import math

    if n < 1 or buckets < 2:
        raise ValueError(f"need n >= 1 and buckets >= 2, got {n}/{buckets}")
    from pyspark import StorageLevel

    # the raw model IS docfeat rolled up by bucket, so the raw corpus
    # is gram-exploded ONCE (into the persisted per-doc bucket counts)
    # instead of once per surface; the target model keeps its own
    # explode (a different slice). Both models are <= buckets rows —
    # metadata-sized driver collects (they would ride as broadcasts
    # regardless); the log-ratio per bucket is then CPython libm, not
    # JVM Math.log (see module doc)
    from pandas_rust_algos_spark import cachelife

    # tracked: the cache feeds the q-model collect here AND the
    # returned per-doc weight plan
    docfeat = cachelife.track(
        raw.select(F.col(id_col),
                   F.explode(token_ngrams(text_col, n)).alias("g"))
        .select(id_col, _bucket(F.col("g"), buckets).alias("b"))
        .groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c_db"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    p_cnt = {r["b"]: r["c"] for r in
             _model(target, text_col, n, buckets).collect()}
    q_cnt = {r["b"]: r["c"] for r in
             docfeat.groupBy("b")
             .agg(F.sum("c_db").alias("c")).collect()}
    n_p = sum(p_cnt.values())
    n_q = sum(q_cnt.values())
    # every docfeat bucket appears in q (it was counted from raw), so
    # q's support is the full domain; p falls back to the +1 smoother
    dlr_rows = [
        (int(b),
         math.log((p_cnt.get(b, 0) + 1) / (n_p + buckets))
         - math.log((c_q + 1) / (n_q + buckets)))
        for b, c_q in q_cnt.items()
    ]
    if dlr_rows:
        dlr = raw.sparkSession.createDataFrame(
            dlr_rows, schema="b long, dlr double")
        joined = docfeat.join(F.broadcast(dlr), "b")
    else:
        joined = docfeat.withColumn("dlr", F.lit(0.0))
    term_pico = F.floor(
        F.col("c_db").cast("double") * F.col("dlr") * F.lit(1e12)
    ).cast("long")
    scored = joined.groupBy(id_col).agg(
        F.sum("c_db").alias("n_grams"),
        F.round(F.sum(term_pico).cast("double") / F.lit(1e12), 6)
        .alias("log_weight"),
    )
    return (
        raw.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def sql_dsir_log_weights(
    raw_sql: str,
    target_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1024,
) -> str:
    """DuckDB twin of :func:`dsir_log_weights` — same tokenizer, hash,
    bucketing, smoothing, pico-unit flooring, and final round."""
    from pandas_rust_algos_spark.operators.text import sql_token_ngrams

    grams = sql_token_ngrams(text_col, n)
    # DuckDB % on the non-negative 60-bit hash equals Spark's pmod
    h = ("(CAST('0x' || SUBSTR(md5('0' || ':' || g), 1, 15) "
         f"AS BIGINT) % {buckets})")
    return f"""
    WITH praw AS (
      SELECT {id_col}, UNNEST({grams}) AS g FROM {raw_sql}
    ), ptgt AS (
      SELECT UNNEST({grams}) AS g FROM {target_sql}
    ), p AS (
      SELECT {h} AS b, COUNT(*) AS c_p FROM ptgt GROUP BY 1
    ), q AS (
      SELECT {h} AS b, COUNT(*) AS c_q FROM praw GROUP BY 1
    ), np AS (SELECT SUM(c_p) AS n_p FROM p),
    nq AS (SELECT SUM(c_q) AS n_q FROM q),
    docfeat AS (
      SELECT {id_col}, {h} AS b, COUNT(*) AS c_db
      FROM praw GROUP BY 1, 2
    ), terms AS (
      SELECT d.{id_col}, d.c_db,
             CAST(FLOOR(
               CAST(d.c_db AS DOUBLE)
               * (LN(CAST(COALESCE(p.c_p, 0) + 1 AS DOUBLE)
                     / CAST(n_p + {buckets} AS DOUBLE))
                  - LN(CAST(COALESCE(q.c_q, 0) + 1 AS DOUBLE)
                       / CAST(n_q + {buckets} AS DOUBLE)))
               * 1e12) AS BIGINT) AS term_pico
      FROM docfeat d
      LEFT JOIN p ON p.b = d.b
      LEFT JOIN q ON q.b = d.b
      CROSS JOIN np CROSS JOIN nq
    ), scored AS (
      SELECT {id_col},
             CAST(SUM(c_db) AS BIGINT) AS n_grams,
             ROUND(CAST(SUM(term_pico) AS DOUBLE) / 1e12, 6)
               AS log_weight
      FROM terms GROUP BY 1
    )
    SELECT r.{id_col},
           COALESCE(s.n_grams, 0) AS n_grams,
           COALESCE(s.log_weight, CAST(0.0 AS DOUBLE)) AS log_weight
    FROM (SELECT {id_col} FROM {raw_sql}) r
    LEFT JOIN scored s ON r.{id_col} = s.{id_col}
    """
