"""Distribution-drift reporting between two datasets (or two versions
of one dataset) — the monitoring op a pipeline runs before promoting a
new ingest batch: has the distribution of a numeric column moved?

Design: the REFERENCE side defines ``n_buckets`` equal-width bins over
its own [min, max]; both sides histogram into those bins (values
outside the reference range clamp into the edge bins, so population
drift out of the old support is visible as edge-bucket mass). Output
is one row per bin with counts and rates for both sides — the inputs
to any divergence score (PSI, KL, χ²). The scores themselves are left
to the caller because they're one expression over this report, while
the binning is the part that needs to be distributed and
deterministic.

Scale shape: ONE 1-row aggregation on the reference for the bounds
(broadcast), then each side is a narrow map + a 10-row aggregation —
two scans total, shuffle traffic = n_buckets rows. The bin grid is
generated (sequence + explode of a literal), so empty bins appear with
zero counts instead of silently vanishing from the report.

Determinism: bucket index arithmetic is double ops on engine-identical
inputs (same min/max, same width) — bit-identical cross-engine; counts
and BIGINT/BIGINT rate divisions likewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["drift_report", "token_kl_divergence",
           "sql_token_kl_divergence"]


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Bucketed distribution comparison of ``col`` between ``ref`` and
    ``cur``: ``(bucket, n_ref, n_cur, rate_ref, rate_cur)``, one row
    per bin including empty ones. NULL values are excluded from both
    sides (a NULL-rate expectation belongs in ``validate.py``)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bounds = ref.agg(
        F.min(F.col(col)).cast("double").alias("lo"),
        F.max(F.col(col)).cast("double").alias("hi"),
    )

    def bucketed(df: DataFrame, tag: int) -> DataFrame:
        width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
        idx = F.when(
            F.col("hi") == F.col("lo"), F.lit(0)
        ).otherwise(
            F.floor((F.col(col).cast("double") - F.col("lo")) / width)
        )
        clamped = F.greatest(
            F.lit(0), F.least(F.lit(n_buckets - 1), idx)
        ).cast("long")
        # When the reference column is all-NULL, lo/hi are NULL, the raw
        # idx is NULL, and greatest/least SKIP nulls — which would clamp
        # every current row into the top bin. With no reference support
        # there is no grid to bin into: drop such rows before clamping.
        return (
            df.where(F.col(col).isNotNull())
            .crossJoin(F.broadcast(bounds))
            .where(idx.isNotNull())
            .select(clamped.alias("bucket"),
                    F.lit(1 - tag).alias("r"), F.lit(tag).alias("c"))
        )

    counts = (
        bucketed(ref, 0).unionByName(bucketed(cur, 1))
        .groupBy("bucket")
        .agg(F.sum("r").alias("n_ref"), F.sum("c").alias("n_cur"))
    )
    grid = (
        ref.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
    )
    full = grid.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = full.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    return full.crossJoin(F.broadcast(totals)).select(
        "bucket", "n_ref", "n_cur",
        F.when(F.col("t_ref") > 0,
               F.col("n_ref").cast("double") / F.col("t_ref"))
        .alias("rate_ref"),
        F.when(F.col("t_cur") > 0,
               F.col("n_cur").cast("double") / F.col("t_cur"))
        .alias("rate_cur"),
    )


def token_kl_divergence(
    df: DataFrame,
    ref: DataFrame,
    *,
    group: str,
    text_col: str = "text",
) -> DataFrame:
    """TEXT-domain drift: add-1-smoothed token-distribution KL
    divergence ``KL(P_g || Q)`` of every ``group`` slice of ``df``
    against the reference corpus ``ref`` — the standard corpus-shift
    score for "did this ingest batch's language move away from what we
    train on" (numeric columns use :func:`drift_report`; this is its
    token-distribution sibling). Returns ``(group, n_tokens, n_vocab,
    kl_divergence)`` with the divergence in nats, rounded to 6.

    Per slice g and union vocabulary V_g (tokens of g ∪ tokens of the
    reference): ``p_w = (c_gw + 1) / (N_g + |V_g|)``, ``q_w`` likewise
    from the reference, ``KL = Σ_w p_w · ln(p_w / q_w)`` — ≥ 0, 0 iff
    identical distributions. Determinism follows the ``doc_lm_score``
    recipe: each term is floored to integer PICO-units (1e-12) and
    summed exactly, so the result is partitioning- AND engine-
    independent; the final divide + round-6 absorbs the flooring.

    Scale shape (round-7 fusion — 15 exchanges → ~9): the per-group
    union-vocabulary table ``v`` is built in ONE (group, token)
    aggregation by unioning the raw group-token occurrences with the
    per-group-replicated reference counts (map-side combine collapses
    occurrences before the shuffle, so traffic ∝ distinct tokens) —
    replacing the previous build-both-sides-then-FULL-OUTER shape,
    which shuffled the two vocab tables a second time to align them.
    The per-group totals then come back onto ``v`` as a BROADCAST
    (|groups| rows), not a re-shuffle of the vocab table, and the
    final per-group sum map-side-combines to |groups|·partitions
    rows. The reference counts are computed once and replicated per
    group — at 100 TB everything shuffled is vocabulary-sized, orders
    smaller than the corpora."""
    from pandas_rust_algos_spark.operators.text import tokens

    occ = df.select(
        F.col(group), F.explode(tokens(text_col)).alias("tok"),
        F.lit(1).cast("long").alias("c_p"),
        F.lit(0).cast("long").alias("c_q"),
    )
    q = (
        ref.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_q"))
    )
    groups = df.select(group).distinct()
    q_rep = groups.crossJoin(q).select(
        group, "tok",
        F.lit(0).cast("long").alias("c_p"), F.col("c_q"),
    )
    v = (
        occ.unionByName(q_rep)
        .groupBy(group, "tok")
        .agg(F.sum("c_p").alias("c_p"), F.sum("c_q").alias("c_q"))
    )
    # n_q (the reference-corpus token total) = sum(c_q) within ANY
    # group's replica of v — so it rides the SAME totals aggregation
    # instead of a separate 1-row aggregation + broadcast
    totals = v.groupBy(group).agg(
        F.sum("c_p").alias("n_p"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("c_q").alias("n_q"),
    )
    joined = v.join(F.broadcast(totals), group)
    pw = (F.col("c_p") + 1).cast("double") \
        / (F.col("n_p") + F.col("n_vocab")).cast("double")
    qw = (F.col("c_q") + 1).cast("double") \
        / (F.col("n_q") + F.col("n_vocab")).cast("double")
    term_pico = F.floor(pw * F.log(pw / qw) * F.lit(1e12)).cast("long")
    return (
        joined.groupBy(group)
        .agg(
            F.max("n_p").alias("n_tokens"),
            F.max("n_vocab").alias("n_vocab"),
            F.round(F.sum(term_pico).cast("double") / F.lit(1e12), 6)
            .alias("kl_divergence"),
        )
    )


def sql_token_kl_divergence(
    df_sql: str,
    ref_sql: str,
    *,
    group: str,
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`token_kl_divergence` — same tokenizer,
    smoothing, pico-unit term flooring, and final round."""
    toks = (f"LIST_FILTER(STRING_SPLIT_REGEX(TRIM({text_col}), '\\s+'), "
            "x -> x <> '')")
    return f"""
    WITH p AS (
      SELECT {group}, tok, COUNT(*) AS c_p
      FROM (SELECT {group}, UNNEST({toks}) AS tok FROM {df_sql})
      GROUP BY 1, 2
    ), q AS (
      SELECT tok, COUNT(*) AS c_q
      FROM (SELECT UNNEST({toks}) AS tok FROM {ref_sql})
      GROUP BY 1
    ), grps AS (
      SELECT DISTINCT {group} FROM {df_sql}
    ), qrep AS (
      SELECT grps.{group}, q.tok, q.c_q FROM grps CROSS JOIN q
    ), v AS (
      SELECT COALESCE(p.{group}, qrep.{group}) AS {group},
             COALESCE(p.tok, qrep.tok) AS tok,
             COALESCE(p.c_p, 0) AS c_p,
             COALESCE(qrep.c_q, 0) AS c_q
      FROM p FULL OUTER JOIN qrep
        ON p.{group} = qrep.{group} AND p.tok = qrep.tok
    ), tot AS (
      SELECT {group}, SUM(c_p) AS n_p, COUNT(*) AS n_vocab
      FROM v GROUP BY 1
    ), nq AS (
      SELECT SUM(c_q) AS n_q FROM q
    ), terms AS (
      SELECT v.{group},
             CAST(FLOOR(
               (CAST(c_p + 1 AS DOUBLE) / CAST(n_p + n_vocab AS DOUBLE))
               * LN((CAST(c_p + 1 AS DOUBLE)
                     / CAST(n_p + n_vocab AS DOUBLE))
                    / (CAST(c_q + 1 AS DOUBLE)
                       / CAST(n_q + n_vocab AS DOUBLE)))
               * 1e12) AS BIGINT) AS term_pico,
             n_p, n_vocab
      FROM v JOIN tot ON v.{group} = tot.{group} CROSS JOIN nq
    )
    SELECT {group},
           CAST(MAX(n_p) AS BIGINT) AS n_tokens,
           CAST(MAX(n_vocab) AS BIGINT) AS n_vocab,
           ROUND(CAST(SUM(term_pico) AS DOUBLE) / 1e12, 6)
             AS kl_divergence
    FROM terms GROUP BY 1
    """
