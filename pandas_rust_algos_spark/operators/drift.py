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

__all__ = ["drift_report"]


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
