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
2. **Pair** within clusters only: cosine (rounded to 6 digits, the
   same expression tree both engines — the `embedding_near_dupes`
   recipe) over the original float vectors, threshold inclusive.
   Clustering bounds the pair space to Σ|cluster|² — the SemDeDup
   point: never all-pairs over the corpus.
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
    neighbor of cosine ≥ ``threshold`` with a smaller id."""
    from pandas_rust_algos_spark.operators.similarity import dot, norm

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    asg = kmeans_fixed(df, id_col, vec_col, k=k, iters=iters).select(
        id_col, "cluster")
    # norms are precomputed PER ROW, not per pair — the pair stage is
    # the hot loop (Σ|cluster|² fold evaluations) and sqrt(dot(v,v))
    # of the same vector is bit-identical wherever it is computed, so
    # this is a pure 3×-fewer-folds win with no oracle drift
    base = df.join(asg, id_col).select(
        F.col(id_col),
        F.col("cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    a = base.select(F.col(id_col).alias("id_a"),
                    F.col("v").alias("v_a"),
                    F.col("nv").alias("nv_a"), "cluster")
    b = base.select(F.col(id_col).alias("id_b"),
                    F.col("v").alias("v_b"),
                    F.col("nv").alias("nv_b"), "cluster")
    sim = F.round(
        dot(F.col("v_a"), F.col("v_b"))
        / (F.col("nv_a") * F.col("nv_b")),
        6,
    )
    drops = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(sim >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        base.join(F.broadcast(drops), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.col("__dropped").isNull().alias("kept"),
        )
    )


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
    drop algebra (cosine rounded to 6, the `embedding_near_dupes`
    determinism recipe)."""
    km = sql_kmeans_fixed(table, id_col, vec_col, k=k, iters=iters)
    cos = "ROUND(LIST_DOT_PRODUCT(x.v, y.v) / (x.nv * y.nv), 6)"
    return f"""
    WITH asg AS ({km}),
    base AS (
      SELECT t.{id_col}, a.cluster, t.{vec_col}::DOUBLE[] AS v,
             SQRT(LIST_DOT_PRODUCT(t.{vec_col}::DOUBLE[],
                                   t.{vec_col}::DOUBLE[])) AS nv
      FROM {table} t JOIN asg a USING ({id_col})
    ), drops AS (
      SELECT DISTINCT y.{id_col}
      FROM base x JOIN base y
        ON x.cluster = y.cluster AND x.{id_col} < y.{id_col}
      WHERE {cos} >= {threshold}
    )
    SELECT b.{id_col}, b.cluster, d.{id_col} IS NULL AS kept
    FROM base b LEFT JOIN drops d ON b.{id_col} = d.{id_col}
    """
