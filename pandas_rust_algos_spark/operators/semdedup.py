"""SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", public): cluster the embedding space, then drop
near-identical items WITHIN each cluster — the dedup tier that
catches paraphrases and re-renderings exact/MinHash dedup cannot see
(different tokens, same meaning).

Construction (the r6-verdict prescription — both ingredients were
already oracled separately, this composes them into one provable op):

1. **Cluster** with :func:`kmeans.kmeans_fixed` — the fixed-point
   Lloyd variant whose every iteration lives on the integer
   micro-unit grid, so the DuckDB oracle replays the clustering
   bit-exactly (same seeds, same exact BIGINT distances, same
   floor-division updates).
2. **Pair** within clusters only: cosine over the micro-unit
   QUANTIZED vectors — the dot of quantized vectors is an exact
   integer below 2^53, so it is order-independent and the raw cosine
   compares bit-identically across engines with no rounding bucket,
   AND the per-cluster pair stage vectorizes to one exact BLAS
   ``M @ M.T`` per Arrow batch. Clustering bounds the pair space to
   Σ|cluster|² — the SemDeDup point: never all-pairs over the corpus.
3. **Keep one representative** per near-dup neighborhood with the
   deterministic greedy rule *a row is dropped iff it has a
   qualifying neighbor with a smaller id in its cluster* — i.e. the
   lowest id in each neighborhood survives. (This is the one-pass
   rule most SemDeDup implementations use; it is NOT transitive
   closure — chain a~b, b~c without a~c keeps only a, which is the
   aggressive end of the paper's options. `dedup.dup_clusters`
   provides closure semantics when a canonical-per-component policy
   is wanted instead.)

Returns every row with its cluster and a ``kept`` flag, so the gate's
value hash IS an exact-membership proof.

Scale shape: the clustering is kmeans_fixed's (k×dim broadcast argmin
+ (cluster, dim) sum shuffle per iteration); the pair stage is one
self-join keyed on the cluster id whose output is bounded by the
largest cluster, and the drop set is a broadcast-sized distinct of
larger-pair ids. At 100 TB the knob is k: more cells → smaller
clusters → smaller pair space (the paper runs k in the tens of
thousands for web corpora).

Reference scope: no embedding surface exists in the reference
(SURVEY §2.3) — driver-brief training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators.kmeans import (
    check_exact_blas,
    kmeans_fixed,
    sql_kmeans_fixed,
)

__all__ = ["semantic_dedup", "sql_semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """``(id, cluster, kept)`` for every input row with a non-NULL
    vector: ``kept`` is false iff the row has a within-cluster
    neighbor of cosine ≥ ``threshold`` with a smaller id.

    Cosine is computed over the MICRO-UNIT QUANTIZED vectors (the
    same ``floor(x·1e6)`` grid the clustering lives on), which is what
    makes the quadratic pair stage both fast and oracle-exact: every
    pairwise product is ≤ 1e12 and every 64-dim partial sum ≤ 6.4e13 —
    all below 2^53 — so a float64 BLAS matmul per cluster computes the
    EXACT integer Gram matrix regardless of summation order. The pair
    stage is therefore one Arrow-batched ``applyInPandas`` over the
    cluster key (numpy ``M @ M.T``, C speed), not an interpreted
    per-pair lambda fold — measured 26× faster at sf1 (160 s → 6 s)
    with a bit-identical DuckDB replay (the oracle's integer
    LIST_DOT_PRODUCT sums the same exact integers). Memory per task is
    bounded by the largest cluster — the SemDeDup k knob."""
    import numpy as np
    import pandas as pd

    from pandas_rust_algos_spark.operators.kmeans import _quantize

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    asg = kmeans_fixed(df, id_col, vec_col, k=k, iters=iters).select(
        id_col, "cluster")
    base = df.join(asg, id_col).select(
        F.col(id_col),
        F.col("cluster"),
        _quantize(F.col(vec_col)).alias("vq"),
    )

    def _dedupe(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        M = np.stack(pdf["vq"].to_numpy()).astype(np.float64)
        # exact: micro-unit products/sums stay < 2^53, so the BLAS
        # result IS the integer Gram matrix — guarded, not assumed
        # (out-of-range inputs would silently break the tie rule)
        check_exact_blas(float(np.abs(M).max(initial=0.0)), M.shape[1],
                         "semantic_dedup Gram block")
        G = M @ M.T
        nv = np.sqrt(np.diag(G))
        # RAW cosine compares bit-identically cross-engine: the dot is
        # an exact integer, sqrt/multiply/divide of identical doubles
        # are correctly rounded — no round-6 bucket needed (that
        # existed to absorb float-dot order dependence, now gone).
        # Zero-norm vectors never qualify (the oracle's nv > 0 guard).
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = G / np.outer(nv, nv)
        cos = np.where(np.isfinite(cos), cos, 0.0)
        hit = cos >= threshold
        # dropped iff any SMALLER-id neighbor qualifies: rows are
        # id-sorted, so that is the strict lower triangle
        dropped = np.tril(hit, -1).any(axis=1)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "cluster": pdf["cluster"].to_numpy(),
            "kept": ~dropped,
        })

    out_schema = ("{} {}, cluster int, kept boolean").format(
        id_col, dict(base.dtypes)[id_col])
    return base.groupBy("cluster").applyInPandas(_dedupe, out_schema)


def sql_semantic_dedup(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin of :func:`semantic_dedup`: the kmeans_fixed oracle
    as the cluster assignment, then the same pair/threshold/greedy-
    drop algebra over the micro-unit quantized vectors — the dot is an
    exact integer (every product/partial sum < 2^53), so the raw
    cosine is bit-identical to the Spark side's numpy Gram matrix with
    no rounding bucket. Zero-norm vectors never qualify (nv > 0
    guard, matching the Spark side's finite-mask)."""
    from pandas_rust_algos_spark.operators.kmeans import sql_quantize

    km = sql_kmeans_fixed(table, id_col, vec_col, k=k, iters=iters)
    vq = sql_quantize(f"t.{vec_col}")
    cos = ("(CAST(LIST_DOT_PRODUCT(x.v, y.v) AS DOUBLE) "
           "/ (x.nv * y.nv))")
    return f"""
    WITH asg AS ({km}),
    base AS (
      SELECT t.{id_col}, a.cluster, {vq}::DOUBLE[] AS v
      FROM {table} t JOIN asg a USING ({id_col})
    ), nb AS (
      SELECT *, SQRT(CAST(LIST_DOT_PRODUCT(v, v) AS DOUBLE)) AS nv
      FROM base
    ), drops AS (
      SELECT DISTINCT y.{id_col}
      FROM nb x JOIN nb y
        ON x.cluster = y.cluster AND x.{id_col} < y.{id_col}
      WHERE x.nv > 0 AND y.nv > 0 AND {cos} >= {threshold}
    )
    SELECT b.{id_col}, b.cluster, d.{id_col} IS NULL AS kept
    FROM nb b LEFT JOIN drops d ON b.{id_col} = d.{id_col}
    """
