"""Similarity search over an embedding column (array<float>).

Three tiers:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the full vector table; cosine is a
  zip_with/aggregate column expression (JVM-side, codegen). At 100 TB
  the scan is embarrassingly parallel and the top-k is a per-query
  window over a similarity-pruned subset.
- :func:`lsh_topk` — random-hyperplane LSH: deterministic hyperplanes
  baked as plan literals, signature band buckets, search only within
  shared buckets. Data-independent; recall set by band geometry.
- :func:`ivf_topk` — inverted-file ANN: k-means coarse quantizer,
  probe the nearest cells. Data-adaptive; wins on clustered
  embeddings.

No Python UDFs in the search paths; expression-level throughout.
Quantizer training is seeded k-means++/Lloyd run IN-DRIVER over a
``max_train_rows``-capped sample (``_kmeans_local`` — O(1) in corpus
size by construction; the FAISS convention), so no training job chain
ever touches the cluster beyond one bounded-sample collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine", "dot", "cosine_topk", "hard_negative_topk",
           "lsh_signature", "lsh_topk", "ivf_topk", "ivfpq_topk",
           "ann_recall_report"]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold ⇒ deterministic
    summation order, matching a single-threaded oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _lit_vec(values) -> Column:
    """A double vector as ONE ArrayType literal (a single constant object
    in the plan), not ``dims`` Literal expression nodes — at realistic
    embedding dims (768+) the per-element form bloats the expression
    tree past codegen limits (wholestage fallback, slow analysis).
    Parsed from SQL text for the same ~0.4 ms/element py4j reason as
    :func:`_lit_matrix` (exact: repr round-trip + ``D`` literal)."""
    import math

    vs = [float(x) for x in values]
    if not vs or not all(math.isfinite(x) for x in vs):
        return F.lit(vs)
    return F.expr("array(" + ",".join(repr(x) + "D" for x in vs) + ")")


# Above this many doubles (cells × dims), an IVF centroid matrix stops
# riding the plan as a literal and switches to a single broadcast row —
# plan text and codegen constants stay bounded at production dims
# (e.g. 768-dim × 256 cells = 196k doubles ≫ this cap).
_CENTROID_LITERAL_MAX = 16_384


def _lit_matrix(rows) -> Column:
    """A list of double vectors as ONE array<array<double>> literal.

    Built as SQL TEXT parsed by one ``F.expr`` (r12, guide §1.2
    driver-side work): ``F.lit`` on a nested list falls back to one
    py4j round trip per element — measured ~0.4 ms/element, i.e. ~1 s
    for a 16×64 centroid matrix — while parsing the equivalent literal
    text costs ~5 ms. ``repr(float)`` is the shortest round-trip
    representation and the ``D`` suffix parses via Double.parseDouble,
    so the parsed plan is value-exact (verified bit-equal)."""
    import math

    rs = [[float(x) for x in r] for r in rows]
    if not rs or any(not r for r in rs) or not all(
            math.isfinite(x) for r in rs for x in r):
        return F.lit(rs)  # empty/degenerate/non-finite: rare, tiny
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(repr(x) + "D" for x in r) + ")"
            for r in rs) + ")")


def probe_dims(df: DataFrame, vec_col: str) -> int:
    """Vector width from the first NON-NULL row (a leading NULL must
    not masquerade as dims=0 — r7 ADVICE), or 0 on an all-null/empty
    frame. This is the ONLY ``.first()`` in the ANN family, and it
    runs only as a convenience fallback: every build entry point
    takes an explicit ``dims`` argument (the FAISS convention — the
    index dimension is declared, not discovered), and passing it
    skips this probe job entirely (r8 VERDICT next-#5)."""
    first = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    return len(first[0]) if first is not None else 0


def _collect_vecs(sample: DataFrame) -> list[list[float]]:
    """Collect a single-array-column BOUNDED sample (one job)."""
    return [list(r[0]) for r in sample.collect()]


def _kmeans_local(
    vs: list[list[float]],
    *,
    k: int,
    seed: int,
    max_iter: int = 20,
    normalize: bool = False,
    tol: float = 1e-4,
) -> list[list[float]]:
    """Seeded k-means++ + Lloyd, vectorized IN-DRIVER over an
    already-collected bounded sample (r12, guide §1.2/§2.4): quantizer
    training only ever sees a ``max_train_rows``-capped sample — O(1)
    in corpus size by construction — so distributing it bought nothing
    but scheduler latency: each MLlib ``fit`` ran ~20 Lloyd jobs (plus
    ~5 k-means|| init passes) over KiB of data, and the ANN gates pay
    per-job overhead, not compute (measured: one fit ≈ 0.5–1.5 s at
    gate scale vs <10 ms here; the FAISS convention — train the
    quantizer in-process on a bounded sample, keep corpus-side
    assignment/search distributed). NumPy row-block ops stay well
    under driver memory for any sane (max_train_rows × dims).

    Determinism: rows are canonically sorted (lexicographic) before
    seeding, so the trained centers depend only on the sample SET,
    not on partition/collect order — strictly stronger than the MLlib
    path (whose k-means|| draws were partition-layout dependent).
    Init is seeded NumPy-RandomState k-means++ (D² sampling); Lloyd
    stops at ``tol`` max center shift (the MLlib default) or
    ``max_iter``. Empty clusters keep their previous center."""
    import numpy as np

    X = np.asarray(vs, dtype=np.float64)
    if X.size == 0:
        return []
    if normalize:
        n = np.sqrt((X * X).sum(axis=1))
        n[n == 0] = 1.0
        X = X / n[:, None]
    X = X[np.lexsort(X.T[::-1])]
    k = min(k, len(X))
    rng = np.random.RandomState(seed)
    idx = [int(rng.randint(len(X)))]
    d2 = ((X - X[idx[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d2.sum())
        if tot <= 0.0:
            # all remaining mass sits on chosen centers (duplicate
            # rows): top up with the first not-yet-chosen indices
            rest = [i for i in range(len(X)) if i not in set(idx)]
            idx.extend(rest[: k - len(idx)])
            break
        nxt = int(rng.choice(len(X), p=d2 / tot))
        idx.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[list(idx)].copy()
    kk = len(C)
    for _ in range(max_iter):
        d = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        a = d.argmin(axis=1)
        sums = np.zeros_like(C)
        cnts = np.zeros(kk, dtype=np.int64)
        np.add.at(sums, a, X)
        np.add.at(cnts, a, 1)
        newC = C.copy()
        nz = cnts > 0
        newC[nz] = sums[nz] / cnts[nz][:, None]
        shift = float(np.sqrt(((newC - C) ** 2).sum(axis=1)).max())
        C = newC
        if shift <= tol:
            break
    return [[float(x) for x in c] for c in C]


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries``: (query_id_col, vec_col). The query side is broadcast —
    the fact scan never shuffles; the only exchange is the final tiny
    per-query top-k. Similarities are rounded and tie-broken by id so
    results are total-ordered and engine-comparable.
    """
    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    qs = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), round_digits)
    scored = (
        cand.crossJoin(F.broadcast(qs))
        .where(F.col("qid") != F.col(id_col))
        .select(F.col("qid").alias(query_id_col), F.col(id_col), sim.alias("sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hard_negative_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training (the standard
    retrieval-training data op: for every anchor, the most similar
    items of a DIFFERENT label are the negatives worth training on —
    random negatives are too easy to carry gradient). Exactly
    :func:`cosine_topk` restricted to cross-label pairs: per query
    the top-k by cosine among rows whose ``label_col`` differs from
    the query's.

    Scale shape: identical to ``cosine_topk`` (broadcast query side,
    fact scan never shuffles, per-query TakeOrdered-sized rank window)
    — this is the exact baseline; at corpus scale mine within the ANN
    candidate set instead (``ivf_topk`` / ``lsh_topk`` output joined
    against labels) for the same semantics over a bucketed pair space.
    Determinism: the round-6 + id tie-break recipe the cosine gates
    share."""
    cand = df.select(
        F.col(id_col), F.col(label_col).alias("__lbl"),
        _as_double(F.col(vec_col)).alias("v"))
    qs = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(label_col).alias("__qlbl"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), round_digits)
    scored = (
        cand.crossJoin(F.broadcast(qs))
        .where(F.col("qid") != F.col(id_col))
        .where(~F.col("__lbl").eqNullSafe(F.col("__qlbl")))
        .select(F.col("qid").alias(query_id_col), F.col(id_col),
                F.col("__lbl").alias(label_col), sim.alias("sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_weight(p: int, d: int) -> float:
    """Deterministic ±1 hyperplane weight from a splitmix64-style bit
    mix of (p, d) — computed at plan-build time in Python, embedded as
    literals, identical on every executor with zero shipped state."""
    x = ((p * 1_000_003 + d) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return 1.0 if x & 1 else -1.0


def lsh_signature(vec: Column, *, planes: int = 16, dims: int = 64) -> Column:
    """Random-hyperplane signature: bit p = sign(Σ_d v[d]·w(p,d)).

    Weights are *literal* arrays baked into the plan (see
    :func:`_plane_weight`): an earlier per-element
    ``xxhash64(lit, lit)``-inside-WHEN formulation was not constant-
    folded by Catalyst and evaluated planes×dims hash calls per row —
    ~7× slower at sf0.1. Literal arrays keep the whole signature one
    codegen'd expression."""
    bits = []
    for p in range(planes):
        weights = _lit_vec(_plane_weight(p, d) for d in range(dims))
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long"))
        )
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    planes: int = 24,
    dims: int = 64,
    band_bits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any of the
    signature's ``planes/band_bits`` bands with the query, then exact
    cosine within candidates.

    Band geometry sets the recall/cost point for a given neighbor
    distance: P(band hit) = (1 - θ/π)^band_bits per band, where θ is
    the query-neighbor angle. Defaults (6 bands × 4 bits) target
    moderate-similarity regimes (cosine ≈ 0.3 → ~55% recall at ~1/3
    of the scan); for high-similarity near-dup search (cosine ≥ 0.9)
    widen bands (8 bits) to cut cost — recall stays high there."""
    nbands = planes // band_bits
    mask = (1 << band_bits) - 1

    def with_bands(frame: DataFrame, ident: str) -> DataFrame:
        sig = lsh_signature(_as_double(F.col(vec_col)), planes=planes, dims=dims)
        base = frame.select(
            F.col(ident), _as_double(F.col(vec_col)).alias(f"v_{ident}"),
            sig.alias("sig"),
        )
        return base.select(
            F.col(ident), F.col(f"v_{ident}"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("sig", i * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("bucket"),
                )
                for i in range(nbands)
            ])).alias("bb"),
        ).select(ident, f"v_{ident}", "bb.band", "bb.bucket")

    cb = with_bands(df.select(F.col(id_col), F.col(vec_col)), id_col)
    qb = with_bands(
        queries.select(F.col(query_id_col), F.col(vec_col)), query_id_col
    )
    sim = F.round(
        cosine(F.col(f"v_{query_id_col}"), F.col(f"v_{id_col}")), round_digits
    )
    cand = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .where(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_digits: int = 6,
    train_fraction: float = 0.25,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_cells`` k-means cells, then search only each query's ``n_probe``
    nearest cells — the standard coarse-quantizer ANN layout.

    Scale shape, stage by stage:

    - **Training** runs on a ``train_fraction`` sample capped at
      ``max_train_rows`` — centroids only need the corpus *shape*, not
      the corpus, so the one bounded-sample collect + in-driver fit
      is O(1) regardless of input
      size (with a fall-back to the full corpus when the sample is too
      small to seed ``n_cells`` cells). Training vectors are
      unit-normalized so euclidean k-means on the unit sphere yields
      directional (spherical-k-means-shaped) cells.
    - **Assignment is a pure map-side expression, zero exchange**: the
      ``n_cells`` centroids are baked into the plan as literal arrays
      and each row takes the argmax of ``dot(v, centroid)``. No
      normalization is needed here: the row's norm scales every cell
      score by the same positive factor, so the arg-ranking is
      identical — which also removes any per-element norm recompute.
    - **Probing** uses the same literal-centroid expression on the
      (small) query side, keeping the top ``n_probe`` cells; the probe
      join then touches ~``n_probe/n_cells`` of the corpus per query.

    Unlike LSH, cell quality adapts to the data distribution, which is
    why IVF wins on clustered embeddings.
    """
    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    # ONE collect job over the bounded sample, then in-driver seeded
    # k-means++/Lloyd (``_kmeans_local``): the previous MLlib fit ran
    # ~25 scheduler-bound jobs over this same KiB-sized sample.
    # Normalization happens in NumPy (unit vectors ⇒ directional,
    # spherical-k-means-shaped cells, as before).
    vs = _collect_vecs(
        cand.sample(fraction=min(1.0, train_fraction), seed=seed)
        .limit(max_train_rows).select("v")
    )
    if len(vs) < n_cells * 10:
        vs = _collect_vecs(cand.limit(max_train_rows).select("v"))
    centers = list(enumerate(_kmeans_local(
        vs, k=n_cells, seed=seed, normalize=True)))

    # Centroids normally ride the plan as ONE array<array<double>>
    # literal — zero exchange, zero shipped state. Past a size
    # threshold (e.g. 768-dim × hundreds of cells) a plan literal that
    # large bloats the serialized plan and codegen constant pool, so
    # the matrix instead rides as a single broadcast ROW cross-joined
    # onto both sides: the expression tree stays O(1) and the doubles
    # move as broadcast data, not plan text.
    dims = len(centers[0][1]) if centers else 0
    matrix_vals = [c for _, c in centers]
    as_broadcast_row = n_cells * dims > _CENTROID_LITERAL_MAX
    if as_broadcast_row:
        from pyspark.sql.types import (
            ArrayType, DoubleType, StructField, StructType,
        )

        cm_df = df.sparkSession.createDataFrame(
            [(matrix_vals,)],
            StructType([StructField(
                "__cmatrix", ArrayType(ArrayType(DoubleType())))]),
        )
        cmatrix = F.col("__cmatrix")
    else:
        cmatrix = _lit_matrix(matrix_vals)

    def nearest_cells_expr(vcol: Column, n: int) -> Column:
        """Top-n cell ids by dot score, wholly inside codegen: the whole
        centroid matrix is ONE array<array<double>> literal (a single
        plan constant — expression-tree size is O(1) in n_cells×dims, so
        realistic dims never hit codegen limits), indexed transform
        scores each cell, struct sort (-score asc ≡ score desc, cell-id
        tiebreak), slice. No join, no window, no shuffle."""
        scored = F.transform(
            cmatrix,
            lambda c, i: F.struct((-dot(vcol, c)).alias("negd"), i.alias("cell")),
        )
        return F.transform(
            F.slice(F.array_sort(scored), 1, n),
            lambda s: s.getField("cell"),
        )

    if as_broadcast_row:
        cand = cand.crossJoin(F.broadcast(cm_df))
    assigned = cand.withColumn(
        "cell", nearest_cells_expr(F.col("v"), 1)[0]
    )
    probes = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    if as_broadcast_row:
        assigned = assigned.drop("__cmatrix")
        probes = probes.crossJoin(F.broadcast(cm_df))
    probes = probes.withColumn(
        "cell", F.explode(nearest_cells_expr(F.col("qv"), n_probe)))
    if as_broadcast_row:
        probes = probes.drop("__cmatrix")
    sim = F.round(cosine(F.col("qv"), F.col("v")), round_digits)
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("qid") != F.col(id_col))
        .select(F.col("qid").alias(query_id_col), id_col, sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    m: int = 4,
    k_codes: int = 16,
    seed: int = 42,
    max_train_rows: int = 100_000,
    dims: int | None = None,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the vector into
    ``m`` contiguous subspaces and k-means each on a bounded sample.
    Returns ``m`` codebooks of ``k_codes`` sub-centroids each —
    metadata-sized (m·k·(d/m) doubles), the only training-time pass;
    everything downstream is pure expressions. Pass ``dims`` (the
    FAISS convention) to skip the fallback width-probe job."""
    if dims is None:
        dims = probe_dims(df, vec_col)
    if dims == 0 or dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub = dims // m
    # ONE collect job over the bounded sample, then every sub-book
    # trains in-driver on its NumPy column slice (``_kmeans_local``):
    # the previous m concurrent MLlib fits each ran ~20 Lloyd jobs
    # over a persisted slice of this same capped sample — pure
    # scheduler latency at any scale, since the sample is O(1) in the
    # corpus by construction.
    import numpy as np

    vs = np.asarray(_collect_vecs(
        df.select(_as_double(F.col(vec_col)).alias("v"))
        .limit(max_train_rows)
    ), dtype=np.float64)
    if vs.size == 0:
        return [[] for _ in range(m)]
    return [
        _kmeans_local(vs[:, j * sub:(j + 1) * sub].tolist(),
                      k=k_codes, seed=seed + j)
        for j in range(m)
    ]


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    m: int = 4,
    k_codes: int = 16,
    seed: int = 42,
    round_digits: int = 6,
    rerank: int | None = None,
    dims: int | None = None,
) -> DataFrame:
    """Product-quantization ANN top-k by approximate inner product
    (ADC — asymmetric distance computation), with optional exact
    re-ranking of the PQ shortlist (``rerank`` candidates per query) —
    the production IVF-PQ pattern: codes prune the corpus, a float
    pass over the tiny shortlist restores ordering quality.

    The 100 TB story: the corpus compresses to ``m`` small-int codes
    per vector (e.g. 768 floats → 4 bytes at m=4, k=16) in a single
    narrow map — the codebooks ride the plan as literals, so encoding
    is zero-exchange and the code table is ~1000× smaller than the
    raw embedding store. Each query precomputes an m×k_codes score
    table (query subvector · each sub-centroid) on the broadcast-sized
    query side; scoring a corpus row is then ``m`` array lookups —
    no per-pair float vector math at all. Exact top-k per query over
    the approximate scores via the standard rank window.
    """
    books = pq_train_codebooks(
        df, vec_col, m=m, k_codes=k_codes, seed=seed, dims=dims
    )
    dims = sum(len(b[0]) for b in books)
    sub = dims // m

    # The encode / score-table expression trees are built as SQL TEXT
    # and parsed in ONE ``F.expr`` call each (r12, guide §1.2 "driver
    # work"): the per-``Column``-op py4j round trip measures ~4 ms on
    # this host, so assembling these m-way trees call-by-call cost
    # ~1.5 s of pure driver latency per query build — ~100× the cost
    # of parsing the same tree from text. The codebooks ride as one
    # 3-D array literal column (a single ``F.lit``); the parsed plan
    # is operation-for-operation the tree the Column API built.
    def _enc_sub(j: int) -> str:
        # nearest sub-centroid by squared euclidean distance; struct
        # (d, code) min gives the lowest-code tie rule, as before
        return (
            f"array_min(transform(__bk[{j}], (c, i) -> "
            f"struct(aggregate(zip_with(slice(__v, {j * sub + 1}, "
            f"{sub}), c, (x, y) -> (x - y) * (x - y)), 0.0D, "
            f"(a, x) -> a + x) AS d, i AS code))).code"
        )

    def _dot_sql(a: str, b: str) -> str:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"0.0D, (acc, x) -> acc + x)")

    def _tbl_sub(j: int) -> str:
        return (f"transform(__bk[{j}], c -> "
                f"{_dot_sql(f'slice(__q, {j * sub + 1}, {sub})', 'c')})")

    cast_vec = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    # the 3-D codebook literal as parsed SQL text, like _lit_matrix
    # (r12): F.lit on the nested list measured ~1.4 s of py4j per call
    import math as _math

    if books and all(
            _math.isfinite(x) for bk in books for r in bk for x in r):
        bk_col = F.expr("array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in r) + ")"
                for r in bk) + ")"
            for bk in books) + ")")
    else:
        bk_col = F.lit(books)
    coded = (
        df.select(F.col(id_col), F.expr(cast_vec).alias("__v"))
        .withColumn("__bk", bk_col)
        .select(id_col, F.expr(
            "array(" + ", ".join(_enc_sub(j) for j in range(m)) + ")"
        ).alias("codes"))
    )
    qs = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.expr(cast_vec).alias("__q"))
        .withColumn("__bk", bk_col)
        .select("qid", F.expr(
            "array(" + ", ".join(_tbl_sub(j) for j in range(m)) + ")"
        ).alias("tables"))
    )
    # approx dot = Σ_j tables[j][codes[j]]; element_at is 1-based
    approx = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0.0D, (acc, j) -> acc + "
        f"element_at(element_at(tables, j + 1), "
        f"element_at(codes, j + 1) + 1))"
    )
    scored = coded.crossJoin(F.broadcast(qs)).select(
        F.col("qid").alias(query_id_col),
        id_col,
        F.round(approx, round_digits).alias("approx_dot"),
    ).where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_dot").desc(), F.col(id_col)
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return ranked.where(F.col("rank") <= k)
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    # exact pass over the shortlist only: |queries|·rerank rows — the
    # raw-vector join touches a metadata-sized slice of the corpus
    short = ranked.where(F.col("rank") <= rerank).select(query_id_col, id_col)
    cvec = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv"))
    qvec = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("__qv")
    )
    exact = (
        short.join(cvec, id_col)
        .join(F.broadcast(qvec), query_id_col)
        .select(
            query_id_col, id_col,
            F.round(dot(F.col("__qv"), F.col("__cv")), round_digits)
            .alias("exact_dot"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("exact_dot").desc(), F.col(id_col)
    )
    return exact.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


def ivfpq_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    k_codes: int = 16,
    seed: int = 42,
    round_digits: int = 6,
    rerank: int | None = None,
    train_fraction: float = 0.25,
    max_train_rows: int = 100_000,
    dims: int | None = None,
) -> DataFrame:
    """COMPOSED IVF+PQ ANN — the production retrieval shape at 100 TB:
    coarse IVF cells PRUNE the corpus (each query's ADC pass touches
    ~``n_probe/n_cells`` of the code table), PQ codes compress what
    remains to ``m`` small ints per vector, and an optional exact pass
    re-ranks the tiny shortlist. Composes :func:`ivf_topk`'s coarse
    quantizer with :func:`pq_topk`'s ADC scoring — previously each ran
    alone, so PQ scored the FULL code table per query
    (r7 VERDICT next-#4).

    Scoring follows the inner-product IVF-ADC decomposition: with
    residual codes ``r = v − c_cell``,
    ``q·v = q·c_cell + q·r ≈ q·c_cell + Σ_j table_j[code_j]`` where
    ``table_j[c] = q_sub_j · book_j[c]`` — the per-query score tables
    are CELL-INDEPENDENT (computed once per query from the raw query
    vector), only the scalar base ``q·c_cell`` varies per probe. PQ
    codebooks are trained on residuals (they concentrate near zero,
    so ``k_codes`` sub-centroids cover them far better than the raw
    space — Jégou et al. 2011).

    Scale shape: two bounded in-driver trainings (coarse + m sub-books, on
    a capped sample); cell assignment, residuals, and encoding are
    zero-exchange literal-matrix expressions; the search is ONE
    broadcast join of the exploded query probes onto the coded corpus
    (each corpus row carries m codes + a cell int, ~1000× smaller than
    raw embeddings); rerank joins raw vectors for |queries|·rerank
    rows only. The oracle-able fixed-point twin is
    :func:`ann_portable.ivfpq_topk_fixed`."""
    if n_probe < 1 or n_probe > n_cells:
        raise ValueError(f"need 1 <= n_probe <= n_cells, got "
                         f"{n_probe}/{n_cells}")
    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    if dims is None:
        dims = probe_dims(df, vec_col)
    if dims == 0 or dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub = dims // m

    # coarse quantizer: ONE collect of the bounded sample + in-driver
    # seeded k-means++/Lloyd (see ``_kmeans_local`` — the MLlib fit it
    # replaces ran ~25 scheduler-bound jobs over KiB of sample)
    vs = _collect_vecs(
        cand.sample(fraction=min(1.0, train_fraction), seed=seed)
        .limit(max_train_rows).select("v")
    )
    if len(vs) < n_cells * 10:
        vs = _collect_vecs(cand.limit(max_train_rows).select("v"))
    cmatrix = _lit_matrix(_kmeans_local(
        vs, k=n_cells, seed=seed, normalize=True))

    def nearest_cells(vcol: Column, n: int) -> Column:
        scored = F.transform(
            cmatrix,
            lambda c, i: F.struct(
                (-dot(vcol, c)).alias("negd"), i.alias("cell")),
        )
        return F.transform(
            F.slice(F.array_sort(scored), 1, n),
            lambda s: s.getField("cell"),
        )

    # residuals against the assigned cell — a narrow expression map
    # reused by the sub-book training sample and the encode pass (no
    # persist: training is now ONE bounded-sample collect, so nothing
    # scans asg repeatedly; the encode pass recomputes the cheap
    # expressions in its own single scan)
    asg = (
        cand.withColumn("cell", nearest_cells(F.col("v"), 1)[0])
        .withColumn(
            "r",
            F.zip_with(
                "v", F.element_at(cmatrix, F.col("cell") + 1),
                lambda a, b: a - b),
        )
    )
    # the same seeded-sample recipe as the coarse training: a bare
    # unordered limit()'s row set depends on task completion order
    # (r8 ADVICE); ONE collect of the bounded residual sample, then
    # all m sub-books fit in-driver on NumPy column slices
    # (``_kmeans_local`` — replaces m concurrent MLlib fit chains)
    import numpy as np

    rvs = np.asarray(_collect_vecs(
        asg.sample(fraction=min(1.0, train_fraction), seed=seed)
        .limit(max_train_rows).select("r")
    ), dtype=np.float64)
    if len(rvs) < k_codes * 4:
        # tiny-input fallback, as in the coarse training above
        rvs = np.asarray(_collect_vecs(
            asg.limit(max_train_rows).select("r")), dtype=np.float64)
    books = [
        _lit_matrix(_kmeans_local(
            rvs[:, j * sub:(j + 1) * sub].tolist(),
            k=k_codes, seed=seed + j))
        for j in range(m)
    ] if rvs.size else [_lit_matrix([]) for _ in range(m)]

    def encode(rcol: Column) -> Column:
        codes = []
        for j in range(m):
            sv = F.slice(rcol, j * sub + 1, sub)
            scored = F.transform(
                books[j],
                lambda c, i: F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv, c, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda a, x: a + x,
                    ).alias("d"),
                    i.alias("code"),
                ),
            )
            codes.append(F.array_min(scored).getField("code"))
        return F.array(*codes)

    coded = asg.select(id_col, "cell", encode(F.col("r")).alias("codes"))

    probes = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn(
            "cell", F.explode(nearest_cells(F.col("qv"), n_probe)))
        .withColumn(
            "base",
            dot(F.col("qv"), F.element_at(cmatrix, F.col("cell") + 1)))
        .withColumn(
            "tables",
            F.array(*[
                F.transform(
                    books[j],
                    lambda c: dot(
                        F.slice(F.col("qv"), j * sub + 1, sub), c))
                for j in range(m)
            ]),
        )
        .drop("qv")
    )
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    approx = F.col("base") + F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("tables"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        ),
    )
    # one cell per corpus row ⇒ each (query, candidate) pair appears
    # at most once; no distinct pass (unlike LSH bands)
    scored = (
        coded.join(F.broadcast(probes), "cell")
        .where(F.col("qid") != F.col(id_col))
        .select(
            F.col("qid").alias(query_id_col),
            id_col,
            F.round(approx, round_digits).alias("approx_dot"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_dot").desc(), F.col(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return ranked.where(F.col("rank") <= k)
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    short = ranked.where(F.col("rank") <= rerank).select(
        query_id_col, id_col)
    cvec = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__cv"))
    qvec = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("__qv"))
    exact = (
        short.join(cvec, id_col)
        .join(F.broadcast(qvec), query_id_col)
        .select(
            query_id_col, id_col,
            F.round(dot(F.col("__qv"), F.col("__cv")), round_digits)
            .alias("exact_dot"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("exact_dot").desc(), F.col(id_col))
    return exact.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k)


def ann_recall_report(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    dims: int | None = None,
    ivf_floor: float = 0.3,
    pq_floor: float = 0.4,
    ivfpq_floor: float = 0.25,
) -> DataFrame:
    """Bounds-contract companion to the float ANN trio (the
    ``group_approx_bounds_report`` recipe, r9 VERDICT next-#6): the
    three MLlib-k-means tiers produce engine-specific rankings — no
    DuckDB oracle can replay them value-for-value — so this report
    computes each tier AND its exact brute-force baseline in ONE plan
    and emits only what an oracle CAN pin: one row per tier,
    ``(tier, n_queries, k, recall_ok)``, where ``recall_ok`` asserts
    mean recall ≥ the tier's floor. The quantizers are seeded and the
    data is fixed, so the verdict is stable under the gate's pinned
    session config — and a recall regression flips a boolean, which
    flips the value hash.

    Truth sets follow each tier's own metric (the
    tests/test_similarity.py convention): IVF against the COSINE
    brute force, the PQ family against the DOT-PRODUCT brute force
    (PQ approximates raw inner products — normalizing its baseline
    would mis-score a correct implementation). Mean recall is
    computed as total matched pairs / (n_queries·k) — a semi join of
    each tier's (query, id) pairs against its baseline's, so nothing
    but top-k lists ever aggregates.

    Scale shape: the brute baselines are the standard broadcast-query
    crossJoin + per-query rank window (corpus never shuffles); the
    tiers keep their own audited plans; every aggregate here is over
    top-k lists (|queries|·k rows). Floors are loose by design — cell
    shapes vary with partitioning (see the pq recall test's note) —
    but sit 15-60× above the random-K-of-N baseline, so they separate
    a working index from a broken one at every fixture scale."""
    brute_cos = cosine_topk(
        df, queries, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, k=k,
    ).select(query_id_col, id_col)

    cand = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    qs = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("s").desc(), F.col(id_col))
    brute_dot = (
        cand.crossJoin(F.broadcast(qs))
        .where(F.col("qid") != F.col(id_col))
        .select(F.col("qid").alias(query_id_col), F.col(id_col),
                F.round(dot(F.col("qv"), F.col("v")), 6).alias("s"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col)
    )

    nq = queries.select(
        F.countDistinct(query_id_col).cast("long").alias("n_queries"))

    def tier_row(tier: str, ann: DataFrame, brute: DataFrame,
                 floor: float) -> DataFrame:
        hits = (
            ann.select(query_id_col, id_col)
            .join(brute, [query_id_col, id_col], "left_semi")
            .agg(F.count(F.lit(1)).alias("__n_hits"))
        )
        return hits.crossJoin(F.broadcast(nq)).select(
            F.lit(tier).alias("tier"),
            F.col("n_queries"),
            F.lit(k).cast("long").alias("k"),
            (
                F.col("__n_hits").cast("double")
                / (F.col("n_queries") * F.lit(k))
                >= F.lit(floor)
            ).alias("recall_ok"),
        )

    # the three tiers train independently (18 seeded MLlib fits total
    # — at gate scale the wall cost is fit-scheduling latency, not
    # data), so construct them concurrently like the sub-book fits;
    # each tier's plan/centroids are unchanged, only the wall clock
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_ivf = ex.submit(
            ivf_topk, df, queries, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, k=k)
        f_pq = ex.submit(
            pq_topk, df, queries, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, k=k, m=8, k_codes=16,
            rerank=100, dims=dims)
        f_ivfpq = ex.submit(
            ivfpq_topk, df, queries, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, k=k, n_cells=16,
            n_probe=6, m=8, k_codes=16, rerank=100, dims=dims)
        ivf, pq, ivfpq = f_ivf.result(), f_pq.result(), f_ivfpq.result()
    return (
        tier_row("ivf", ivf, brute_cos, ivf_floor)
        .unionByName(tier_row("pq", pq, brute_dot, pq_floor))
        .unionByName(tier_row("ivfpq", ivfpq, brute_dot, ivfpq_floor))
    )
